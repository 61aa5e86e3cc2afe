"""CISTA-LSTC parity vs the upstream torch reference at equal weights."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import add_reference_to_path
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.models import cista_lstc


@pytest.fixture(scope="module")
def ref_net():
    add_reference_to_path()
    from e2v.e2v_model import CistaLSTCNet

    torch.manual_seed(0)
    net = CistaLSTCNet(image_dim=(32, 48), base_channels=64, depth=5, num_bins=5)
    net.eval()
    return net


class Cfg:
    num_bins = 5
    base_channels = 64
    depth = 5


def test_cista_lstc_two_steps(ref_net):
    rng = np.random.default_rng(1)
    B, H, W = 2, 32, 48
    params = ti.cista_lstc_params(ti.from_torch(ref_net))

    events1 = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    events2 = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    img0 = rng.random((B, H, W, 1), dtype=np.float32)

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))

    with torch.no_grad():
        ref1, states = ref_net(t(events1), t(img0), None)
        ref2, states = ref_net(t(events2), ref1, states)

    state = cista_lstc.zero_state(B, (H, W), 64)
    got1, state = cista_lstc.apply(params, jnp.asarray(events1), jnp.asarray(img0), state)
    got2, state = cista_lstc.apply(params, jnp.asarray(events2), got1, state)

    for got, ref in [(got1, ref1), (got2, ref2)]:
        ref_nhwc = np.transpose(ref.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), ref_nhwc, rtol=1e-4, atol=1e-5)


def test_cista_state_matches_reference(ref_net):
    rng = np.random.default_rng(2)
    B, H, W = 1, 32, 48
    params = ti.cista_lstc_params(ti.from_torch(ref_net))
    events = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    img0 = rng.random((B, H, W, 1), dtype=np.float32)

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))

    with torch.no_grad():
        _, ref_states = ref_net(t(events), t(img0), None)

    state = cista_lstc.zero_state(B, (H, W), 64)
    _, got = cista_lstc.apply(params, jnp.asarray(events), jnp.asarray(img0), state)

    pairs = [
        (got.lstc_cell, ref_states[0]),
        (got.sparse_code, ref_states[1]),
        (got.dg_hidden, ref_states[2][0]),
        (got.dg_cell, ref_states[2][1]),
    ]
    for g, r in pairs:
        np.testing.assert_allclose(
            np.asarray(g), np.transpose(r.numpy(), (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
        )


def test_export_roundtrip(ref_net):
    params = ti.cista_lstc_params(ti.from_torch(ref_net))
    sd = ti.cista_lstc_export(params)
    ref_sd = ti.from_torch(ref_net)
    assert set(sd.keys()) == set(ref_sd.keys())
    for k in sd:
        np.testing.assert_allclose(sd[k], ref_sd[k], rtol=1e-6, atol=1e-7)


def test_npz_state_dict_roundtrip(ref_net, tmp_path):
    """.npz checkpoints (torch-free path, e.g. the gate/ anchor) load
    through load_state_dict with module-prefix stripping and f16 upcast."""
    ref_sd = ti.from_torch(ref_net)
    path = str(tmp_path / "ckpt.npz")
    np.savez(path, **{("module." + k): v.astype(np.float16)
                      for k, v in ref_sd.items()})
    sd = ti.load_state_dict(path)
    assert set(sd.keys()) == set(ref_sd.keys())
    for k in sd:
        assert sd[k].dtype == np.float32
        np.testing.assert_allclose(sd[k], ref_sd[k], rtol=2e-3, atol=2e-3)
    # loads into the model pytree
    params = ti.cista_lstc_params(sd)
    assert params is not None
