"""Loss parity vs the upstream reference (FWL, flow sequence loss, eval
metrics) and internal SSIM checks."""
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import add_reference_to_path
from cista_flow_tpu import losses
from cista_flow_tpu.losses.flow import flow_evaluate, flow_sequence_loss, validity_mask

RNG = np.random.default_rng(21)


def _shim_loss_deps():
    """The reference loss.py imports lpips / pytorch_msssim (absent here);
    shim them — the pieces under test never call into the shims."""
    if "lpips" not in sys.modules:
        m = types.ModuleType("lpips")
        m.LPIPS = lambda net="alex": (lambda *a, **k: torch.tensor(0.0))
        sys.modules["lpips"] = m
    if "pytorch_msssim" not in sys.modules:
        m = types.ModuleType("pytorch_msssim")

        class SSIM(torch.nn.Module):
            def __init__(self, **kw):
                super().__init__()

            def forward(self, a, b):
                return torch.tensor(0.0)

        m.SSIM = SSIM
        sys.modules["pytorch_msssim"] = m
    if "skimage" not in sys.modules:
        m = types.ModuleType("skimage")
        mm = types.ModuleType("skimage.metrics")
        mm.structural_similarity = lambda *a, **k: 0.0
        m.metrics = mm
        sys.modules["skimage"] = m
        sys.modules["skimage.metrics"] = mm


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


class Cfg:
    image_dim = (64, 96)
    warp_mode = "forward"
    is_bi = False


def test_fwl_matches_reference():
    add_reference_to_path()
    _shim_loss_deps()
    from loss import voxel_warping_flow_loss as ref_fwl

    voxel = RNG.standard_normal((2, 32, 48, 5), dtype=np.float32)
    flow = (RNG.standard_normal((2, 32, 48, 2)) * 4).astype(np.float32)
    with torch.no_grad():
        ref = ref_fwl(t(voxel), t(flow))
    got = losses.voxel_warping_flow_loss(jnp.asarray(voxel), jnp.asarray(flow))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)

    with torch.no_grad():
        ref_r = ref_fwl(t(voxel), t(flow), reverse_time=True)
    got_r = losses.voxel_warping_flow_loss(jnp.asarray(voxel), jnp.asarray(flow),
                                           reverse_time=True)
    np.testing.assert_allclose(float(got_r), float(ref_r), rtol=1e-4)


def test_flow_sequence_loss_matches_reference():
    add_reference_to_path()
    _shim_loss_deps()
    from loss import FlowL1LossDict
    from utils.flow_utils import FrameWarp

    cfg = Cfg()
    B, H, W = 2, 64, 96
    n_preds = 3
    preds = [(RNG.standard_normal((B, H, W, 2)) * 3).astype(np.float32)
             for _ in range(n_preds)]
    gt_flow = (RNG.standard_normal((B, H, W, 2)) * 3).astype(np.float32)
    img0 = RNG.random((B, H, W, 1), dtype=np.float32)
    img1 = RNG.random((B, H, W, 1), dtype=np.float32)
    valid = RNG.random((B, H, W, 1), dtype=np.float32)

    ref_loss_fn = FlowL1LossDict((H, W), FrameWarp("forward"))
    with torch.no_grad():
        ref_loss, ref_metrics = ref_loss_fn(
            {"flow_preds": [t(p) for p in preds]},
            {"gt_img0": t(img0), "gt_img1": t(img1), "gt_flow": t(gt_flow),
             "valid": t(valid)})

    batch_flow = {"flow_preds": jnp.stack([jnp.asarray(p) for p in preds])}
    target = {"gt_img0": jnp.asarray(img0), "gt_img1": jnp.asarray(img1),
              "gt_flow": jnp.asarray(gt_flow), "valid": jnp.asarray(valid)}
    got_loss, got_metrics = flow_sequence_loss(batch_flow, target, cfg)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(float(got_metrics["epe"]),
                               float(ref_metrics["epe"]), rtol=1e-4)


def test_flow_evaluate_matches_reference():
    add_reference_to_path()
    _shim_loss_deps()
    from loss import FlowL1LossDict
    from utils.flow_utils import FrameWarp

    cfg = Cfg()
    B, H, W = 1, 64, 96
    flow_final = (RNG.standard_normal((B, H, W, 2)) * 3).astype(np.float32)
    gt_flow = (RNG.standard_normal((B, H, W, 2)) * 3).astype(np.float32)
    img0 = RNG.random((B, H, W, 1), dtype=np.float32)
    img1 = RNG.random((B, H, W, 1), dtype=np.float32)

    ref_loss_fn = FlowL1LossDict((H, W), FrameWarp("forward"))
    with torch.no_grad():
        ref = ref_loss_fn.evaluate(
            t(flow_final),
            {"gt_img0": t(img0), "gt_img1": t(img1), "gt_flow": t(gt_flow)})

    got = flow_evaluate(jnp.asarray(flow_final),
                        {"gt_img0": jnp.asarray(img0),
                         "gt_img1": jnp.asarray(img1),
                         "gt_flow": jnp.asarray(gt_flow)}, cfg)
    for k in ("photo_loss", "epe", "1px", "3px", "5px", "out"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=1e-3,
                                   atol=1e-5, err_msg=k)


def test_validity_mask_matches_reference():
    add_reference_to_path()
    from utils.flow_utils import FrameWarp
    import torch.nn.functional as F

    B, H, W = 1, 32, 48
    img0 = RNG.random((B, H, W, 1), dtype=np.float32)
    img1 = RNG.random((B, H, W, 1), dtype=np.float32)
    flow = (RNG.standard_normal((B, H, W, 2)) * 2).astype(np.float32)

    warp = FrameWarp("forward")
    with torch.no_grad():
        ref = torch.exp(-50 * F.mse_loss(
            warp.warp_frame(t(img0), t(flow)), t(img1), reduction="none"))
    got = validity_mask(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_ssim_reasonable():
    """SSIM sanity: identity -> 1; known analytic cases; symmetry."""
    x = RNG.random((2, 32, 32, 1), dtype=np.float32)
    assert abs(float(losses.ssim(jnp.asarray(x), jnp.asarray(x))) - 1.0) < 1e-6
    y = np.clip(x + RNG.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    s = float(losses.ssim(jnp.asarray(x), jnp.asarray(y)))
    assert 0.0 < s < 1.0
    s2 = float(losses.ssim(jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_allclose(s, s2, rtol=1e-5)


def test_psnr_matches_reference_formula():
    x = RNG.random((1, 16, 16, 1), dtype=np.float32)
    y = RNG.random((1, 16, 16, 1), dtype=np.float32)
    mse = np.mean((x - y) ** 2)
    expect = 20 * np.log10(1.0 / np.sqrt(mse))
    got = float(losses.psnr(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


@pytest.mark.slow  # ~40 s compile (the conv tower); convert-roundtrip tests
def test_lpips_runs():  # keep the fast tier's LPIPS coverage

    import jax

    params = losses.lpips.init(jax.random.PRNGKey(0))
    x = jnp.asarray(RNG.random((1, 64, 64, 1), dtype=np.float32))
    y = jnp.asarray(RNG.random((1, 64, 64, 1), dtype=np.float32))
    d = losses.lpips.lpips(params, x, y)
    assert np.isfinite(float(d))
    assert float(losses.lpips.lpips(params, x, x)) < 1e-6


def test_ssim_matches_independent_numpy():
    """Cross-check the separable-blur SSIM against a direct 2D implementation
    of the msssim algorithm (gaussian 11/1.5, valid padding)."""
    from scipy.signal import convolve2d

    x = RNG.random((1, 40, 44, 1), dtype=np.float32)
    y = np.clip(x + RNG.normal(0, 0.08, x.shape).astype(np.float32), 0, 1)

    g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5**2))
    g = (g / g.sum()).astype(np.float64)
    k2d = np.outer(g, g)

    def blur(a):
        return convolve2d(a, k2d, mode="valid")

    a, b = x[0, :, :, 0].astype(np.float64), y[0, :, :, 0].astype(np.float64)
    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1**2
    s2 = blur(b * b) - mu2**2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    expect = float((((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs).mean())

    got = float(losses.ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)
