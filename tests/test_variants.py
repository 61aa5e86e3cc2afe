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


def test_vanilla_raft_parity():
    """Vanilla RAFT vs the upstream torch model at equal weights
    (ref: DCEIFlow/RAFT.py:28-149)."""
    add_reference_to_path()
    import sys
    import types

    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.models import raft

    # RAFT.py uses DCEIFlow-root-relative imports ('from core...'); alias the
    # DCEIFlow package's submodules under those names and exec the file
    # directly (putting DCEIFlow/ itself on sys.path would shadow the package
    # with DCEIFlow/DCEIFlow.py)
    import importlib
    import importlib.util
    for alias, real in {
            "core.decoder.raft_updater": "DCEIFlow.core.decoder.raft_updater",
            "core.backbone.raft_encoder": "DCEIFlow.core.backbone.raft_encoder",
            "core.corr.raft_corr": "DCEIFlow.core.corr.raft_corr",
            "utils.sample_utils": "DCEIFlow.utils.sample_utils"}.items():
        sys.modules.setdefault(alias, importlib.import_module(real))
    spec = importlib.util.spec_from_file_location(
        "_ref_raft", "/root/reference/DCEIFlow/RAFT.py")
    raft_ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(raft_ref_mod)
    RAFT = raft_ref_mod.RAFT

    torch.manual_seed(3)
    args = types.SimpleNamespace(mixed_precision=False)
    ref = RAFT(args)
    ref.eval()

    # /8-divisible (the reference runs unpadded) and big enough that the
    # coarsest corr level keeps H,W >= 2 (torch's 2y/(H-1)-1 NaNs at 1)
    H, W = 128, 192
    i1 = (RNG.random((1, H, W, 3)) * 255).astype(np.float32)
    i2 = (RNG.random((1, H, W, 3)) * 255).astype(np.float32)
    tt = lambda x: torch.from_numpy(np.ascontiguousarray(
        np.transpose(x, (0, 3, 1, 2))))
    with torch.no_grad():
        out_t = ref({"image1": tt(i1), "image2": tt(i2)}, iters=3)

    cfg = Config(image_dim=(H, W))
    params, state = ti.raft_params(ti.from_torch(ref))
    out, _ = raft.apply(params, state, jnp.asarray(i1), jnp.asarray(i2),
                        cfg, iters=3)
    ref_v = np.transpose(out_t["flow_final"].numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out["flow_final"]), ref_v,
                               rtol=1e-3, atol=1e-3)
    # round-trip: export -> import reproduces params exactly
    sd2 = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
           for k, v in ti.raft_export(params, state).items()}
    ref.load_state_dict(sd2, strict=True)


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
