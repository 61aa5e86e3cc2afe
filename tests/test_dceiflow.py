"""DCEIFlow parity vs the upstream torch reference at equal weights."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import add_reference_to_path
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.models import dceiflow


class Cfg:
    num_bins = 5
    image_dim = (100, 172)  # pads to 128x192; coarsest pyramid level 2x3
    ds = 8
    is_bi = False


@pytest.fixture(scope="module")
def ref_net():
    add_reference_to_path()
    from DCEIFlow.DCEIFlow import DCEIFlow

    torch.manual_seed(0)
    net = DCEIFlow(num_bins=5, args=Cfg())
    net.eval()
    return net


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def test_dceiflow_forward_parity(ref_net):
    rng = np.random.default_rng(5)
    B, H, W = 1, 100, 172
    ev = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    img = rng.random((B, H, W, 1), dtype=np.float32)

    with torch.no_grad():
        ref = ref_net(event_voxel=t(ev), image1=t(img), iters=3)

    params, state = ti.dceiflow_params(ti.from_torch(ref_net))
    out, _ = dceiflow.apply(params, state, jnp.asarray(ev), jnp.asarray(img),
                            Cfg(), iters=3)

    ref_final = np.transpose(ref["flow_final"].numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(out["flow_final"]), ref_final, rtol=1e-3, atol=1e-3)
    for i in range(3):
        ref_i = np.transpose(ref["flow_preds"][i].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(out["flow_preds"][i]), ref_i, rtol=1e-3, atol=1e-3,
            err_msg=f"iter {i}")


def test_dceiflow_bidirectional_parity(ref_net):
    rng = np.random.default_rng(6)
    B, H, W = 1, 100, 172
    ev = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    ev_bw = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    img1 = rng.random((B, H, W, 1), dtype=np.float32)
    img2 = rng.random((B, H, W, 1), dtype=np.float32)

    ref_net.is_bi = True
    try:
        with torch.no_grad():
            ref = ref_net(event_voxel=t(ev), image1=t(img1), image2=t(img2),
                          reversed_event_voxel=t(ev_bw), iters=2)
    finally:
        ref_net.is_bi = False

    params, state = ti.dceiflow_params(ti.from_torch(ref_net))
    out, _ = dceiflow.apply(
        params, state, jnp.asarray(ev), jnp.asarray(img1), Cfg(),
        image2=jnp.asarray(img2), reversed_event_voxel=jnp.asarray(ev_bw),
        iters=2)

    for key in ("fmap2_gt", "fmap2_pseudo", "fmap1_gt", "fmap1_pseudo"):
        ref_v = np.transpose(ref[key].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out[key]), ref_v,
                                   rtol=1e-3, atol=1e-3, err_msg=key)
    for i in range(2):
        ref_i = np.transpose(ref["flow_preds_bw"][i].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(out["flow_preds_bw"][i]), ref_i, rtol=1e-3, atol=1e-3,
            err_msg=f"bw iter {i}")
