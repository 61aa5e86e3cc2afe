"""Seeded randomized parity sweeps over the hot ops — shapes, modes, and
parameters the fixed-size tests don't reach."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cista_flow_tpu import ops
from cista_flow_tpu.ops import corr as C

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_resize_bilinear_randomized():
    rng = np.random.default_rng(7)
    for case in range(16):
        B = int(rng.integers(1, 3))
        H = int(rng.integers(1, 17))
        W = int(rng.integers(1, 17))
        C_ = int(rng.integers(1, 4))
        Ho = int(rng.integers(1, 25))
        Wo = int(rng.integers(1, 25))
        align = bool(rng.integers(0, 2))
        x = rng.standard_normal((B, H, W, C_)).astype(np.float32)
        ref = F.interpolate(nchw(x), size=(Ho, Wo), mode="bilinear",
                            align_corners=align)
        got = ops.resize_bilinear(jnp.asarray(x), (Ho, Wo),
                                  align_corners=align)
        np.testing.assert_allclose(
            np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"case={case} {H}x{W}->{Ho}x{Wo} align={align}")


def test_corr_lookup_mxu_vs_gather_randomized():
    """The separable-GEMM lookup must match the gather reference for any
    radius/levels/shape (incl. levels that pool to 1 pixel)."""
    rng = np.random.default_rng(11)
    for case in range(10):
        B = int(rng.integers(1, 3))
        H = int(rng.integers(4, 15))
        W = int(rng.integers(4, 15))
        D = int(rng.integers(8, 33))
        r = int(rng.integers(1, 5))
        levels = int(rng.integers(1, 5))
        f1 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
        coords = jnp.asarray(
            rng.uniform(-2, max(H, W) + 2, (B, H, W, 2)), jnp.float32)
        pyr = C.build_corr_pyramid(f1, f2, levels)
        a = C.lookup_corr(pyr, coords, r)
        b = C.lookup_corr_gather(pyr, coords, r)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"case={case} {H}x{W} D{D} r{r} L{levels}")


def test_efficient_corr_matches_volume_randomized():
    rng = np.random.default_rng(13)
    for case in range(6):
        B, H, W = 1, int(rng.integers(6, 13)), int(rng.integers(6, 13))
        D = 16
        f1 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
        coords = jnp.asarray(rng.uniform(0, min(H, W), (B, H, W, 2)),
                             jnp.float32)
        pyr = C.build_corr_pyramid(f1, f2, 3)
        ec = C.build_efficient_corr(f1, f2, 3)
        a = C.lookup_corr(pyr, coords, 3)
        b = C.lookup_efficient_corr(ec, coords, 3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"case={case}")


def test_bf16_onehot_warp_vs_f32_gather_randomized():
    """The bf16 C=1 MXU fast path tracks the exact f32 gather path within
    bf16 weight precision across modes and out-of-range grids."""
    rng = np.random.default_rng(17)
    for case in range(12):
        B = int(rng.integers(1, 3))
        H = int(rng.integers(4, 33))
        W = int(rng.integers(4, 33))
        align = bool(rng.integers(0, 2))
        pad = ["zeros", "border", "reflection"][int(rng.integers(0, 3))]
        x = rng.standard_normal((B, H, W, 1)).astype(np.float32)
        grid = (rng.standard_normal((B, H, W, 2)) * 1.5).astype(np.float32)
        exact = ops.grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                align_corners=align, padding_mode=pad)
        fast = ops.grid_sample(jnp.asarray(x, jnp.bfloat16),
                               jnp.asarray(grid),
                               align_corners=align, padding_mode=pad)
        np.testing.assert_allclose(
            np.asarray(fast, np.float32), np.asarray(exact),
            rtol=2e-2, atol=2e-2,
            err_msg=f"case={case} {H}x{W} align={align} pad={pad}")


def test_voxelization_randomized_vs_numpy_golden():
    from cista_flow_tpu.events import voxel as EV

    rng = np.random.default_rng(19)
    for case in range(8):
        H = int(rng.integers(4, 40))
        W = int(rng.integers(4, 40))
        bins = int(rng.integers(2, 7))
        n = int(rng.integers(1, 2000))
        t = np.sort(rng.random(n))
        ev = np.stack([t, rng.integers(0, W, n), rng.integers(0, H, n),
                       rng.integers(0, 2, n)], axis=1).astype(np.float64)
        golden = EV.events_to_voxel_grid_numpy(ev, bins, W, H)
        got = EV.events_to_voxel_grid(ev, bins, W, H)
        np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-5,
                                   atol=1e-5, err_msg=f"case={case}")
