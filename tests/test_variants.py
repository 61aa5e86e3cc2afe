"""Tests for the variant components: SmallEncoder parity, on-the-fly
correlation equivalence, vanilla RAFT, RecIDE, variant layers, CropParameters."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import add_reference_to_path
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.nn import encoders as E
from cista_flow_tpu.ops import corr as CORR

RNG = np.random.default_rng(55)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def test_small_encoder_parity():
    add_reference_to_path()
    from DCEIFlow.core.backbone.raft_encoder import SmallEncoder

    torch.manual_seed(0)
    ref = SmallEncoder(input_dim=3, output_dim=128, norm_fn="instance")
    ref.eval()

    sd = ti.from_torch(ref)
    p, s = {}, {}
    p["conv1"] = ti._conv(sd, "conv1")
    for i in (1, 2, 3):
        for j, suf in ((0, "a"), (1, "b")):
            prefix = f"layer{i}.{j}"
            q = {
                "conv1": ti._conv(sd, prefix + ".conv1"),
                "conv2": ti._conv(sd, prefix + ".conv2"),
                "conv3": ti._conv(sd, prefix + ".conv3"),
                "norm1": {}, "norm2": {}, "norm3": {},
            }
            if prefix + ".downsample.0.weight" in sd:
                q["down"] = ti._conv(sd, prefix + ".downsample.0")
                q["norm4"] = {}
            p[f"layer{i}{suf}"] = q
            s[f"layer{i}{suf}"] = {}
    p["conv2"] = ti._conv(sd, "conv2")
    p["norm1"], s["norm1"] = {}, {}

    x = RNG.standard_normal((1, 64, 96, 3), dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(t(x))
    got, _ = E.small_encoder(p, s, jnp.asarray(x), "instance")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref_out.numpy(), rtol=1e-3, atol=1e-4)


def test_efficient_corr_matches_materialized():
    B, H, W, D = 1, 16, 24, 64
    f1 = RNG.standard_normal((B, H, W, D), dtype=np.float32)
    f2 = RNG.standard_normal((B, H, W, D), dtype=np.float32)
    coords = CORR.coords_grid(B, H, W) + jnp.asarray(
        RNG.standard_normal((B, H, W, 2)).astype(np.float32) * 2)

    pyr = CORR.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    ref = CORR.lookup_corr(pyr, coords, 4)
    ec = CORR.build_efficient_corr(jnp.asarray(f1), jnp.asarray(f2))
    got = CORR.lookup_efficient_corr(ec, coords, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_vanilla_raft_runs():
    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.models import raft

    cfg = Config(image_dim=(64, 96))
    params, state = raft.init(jax.random.PRNGKey(0), cfg)
    i1 = jnp.asarray(RNG.random((1, 64, 96, 1), dtype=np.float32))
    i2 = jnp.asarray(RNG.random((1, 64, 96, 1), dtype=np.float32))
    out, _ = raft.apply(params, state, i1, i2, cfg, iters=2)
    assert out["flow_final"].shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(out["flow_final"])).all()


def test_rec_ide_generator():
    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.models import idnet

    cfg = Config(image_dim=(32, 48))
    params = idnet.init(jax.random.PRNGKey(0), cfg)
    batch = [jnp.asarray(RNG.standard_normal((1, 32, 48, 5), dtype=np.float32))
             for _ in range(4)]
    outs = list(idnet.rec_ide(params, batch, cfg, yield_every=2))
    assert len(outs) == 2
    assert outs[0]["flow_final"].shape == (1, 32, 48, 2)
    assert len(outs[0]["flow_preds"]) == 2


def test_variant_layers_run():
    from cista_flow_tpu.nn import layers as L

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(RNG.standard_normal((2, 16, 16, 8), dtype=np.float32))

    p = L.recurrent_conv_layer_init(key, 8, 16)
    state = (jnp.zeros((2, 16, 16, 16)), jnp.zeros((2, 16, 16, 16)))
    y, (h, c) = L.recurrent_conv_layer(p, x, state, activation="relu")
    assert y.shape == (2, 16, 16, 16)

    p2 = L.recurrent_upsample_conv_layer_init(key, 8, 16)
    state2 = (jnp.zeros((2, 32, 32, 16)), jnp.zeros((2, 32, 32, 16)))
    y2, _ = L.recurrent_upsample_conv_layer(p2, x, state2)
    assert y2.shape == (2, 32, 32, 16)

    p3 = L.neuron_lstc_init(key, 8, 16)
    z = L.neuron_lstc(p3, x, jnp.zeros((2, 16, 16, 16)))
    assert z.shape == (2, 16, 16, 16)

    u = jnp.ones_like(x)
    dt = L.doubletanh(x, u, 0.1)
    assert np.isfinite(np.asarray(dt)).all()


def test_crop_parameters_and_forward_interpolate():
    from cista_flow_tpu.utils import CropParameters, forward_interpolate

    cp = CropParameters(width=240, height=180, num_encoders=3)
    assert cp.width_crop_size == 240 and cp.height_crop_size == 184
    x = RNG.random((180, 240)).astype(np.float32)
    padded = cp.pad(x)
    assert padded.shape == (184, 240)
    cropped = cp.crop(padded)
    np.testing.assert_array_equal(cropped, x)

    flow = RNG.standard_normal((2, 20, 30)).astype(np.float32) * 2
    fwd = forward_interpolate(flow)
    assert fwd.shape == (2, 20, 30)
    assert np.isfinite(fwd).all()
