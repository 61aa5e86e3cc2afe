"""All-pairs correlation volume + pyramid lookup (the RAFT hot kernel), NHWC.

ref: DCEIFlow/core/corr/raft_corr.py:15-65 and ERAFT/corr.py:12-60 (identical).

TPU design: the all-pairs product is one batched (H1*W1, D) x (D, H2*W2)
matmul that tiles directly onto the MXU. The 4-level pyramid is built with
2x2 average pools over the *target* spatial dims. Lookup samples a
(2r+1)^2 window per level with the standard RAFT bilinear sampler
(zeros padding, align_corners=True).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pool import avg_pool2
from .warp import bilinear_sampler


class CorrPyramid(NamedTuple):
    # each level: (B*H1*W1, h_l, w_l, 1)
    levels: tuple
    batch: int
    h1: int
    w1: int


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4) -> CorrPyramid:
    """fmap1/fmap2: (B, H, W, D) -> pyramid of correlation slices."""
    B, H, W, D = fmap1.shape
    a = fmap1.reshape(B, H * W, D)
    b = fmap2.reshape(B, H * W, D)
    # (B, H1W1, H2W2) on the MXU (fp32 accumulation); the stored pyramid
    # keeps the input compute dtype (bf16 mode halves lookup traffic)
    corr = jnp.einsum("bnd,bmd->bnm", a, b,
                      preferred_element_type=jnp.float32)
    corr = (corr / jnp.sqrt(jnp.float32(D))).astype(fmap1.dtype)
    corr = corr.reshape(B * H * W, H, W, 1)
    levels = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2(corr)
        levels.append(corr)
    return CorrPyramid(tuple(levels), B, H, W)


def _interp_matrix(centers: jnp.ndarray, offsets: jnp.ndarray,
                   size: int) -> jnp.ndarray:
    """Bilinear selection matrix W[n, a, s]: weight of source index s for the
    sample at ``centers[n] + offsets[a]``.

    Encodes RAFT's zeros-padding semantics: out-of-range source indices
    simply have no matching column, so their contribution is zero — exactly
    the per-corner masking of the reference's grid_sample(zeros).
    """
    pos = centers[:, None] + offsets[None]          # (n, A)
    lo = jnp.floor(pos)
    frac = pos - lo                                 # (n, A)
    src = jnp.arange(size, dtype=jnp.float32)       # (S,)
    lo_match = (src == lo[..., None]).astype(jnp.float32)
    hi_match = (src == (lo[..., None] + 1.0)).astype(jnp.float32)
    return lo_match * (1.0 - frac[..., None]) + hi_match * frac[..., None]


def lookup_corr(pyr: CorrPyramid, coords: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Sample (2r+1)^2 bilinear windows around ``coords`` at every level.

    coords: (B, H1, W1, 2) pixel coords in level-0 units.
    Returns (B, H1, W1, num_levels*(2r+1)^2), level-major like the torch cat.

    TPU design: a naive gather here (tiny lane dim) is the RAFT TPU
    bottleneck. Because every window offset shares the sample's fractional
    part, the whole bilinear window factorizes into two separable selection
    matmuls: ``window = Wy @ corr @ Wx^T`` — dense batched GEMMs on the MXU
    instead of 4*(2r+1)^2 scatter-gathers. Numerics identical to the
    reference lookup (pinned by tests).
    """
    r = radius
    B, H1, W1, _ = coords.shape
    n = B * H1 * W1
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    cflat = coords.reshape(n, 2)

    out = []
    for i, level in enumerate(pyr.levels):
        _, hl, wl, _ = level.shape
        c = cflat / (2.0 ** i)
        wy = _interp_matrix(c[:, 1], d, hl).astype(level.dtype)
        wx = _interp_matrix(c[:, 0], d, wl).astype(level.dtype)
        corr = level.reshape(n, hl, wl)
        rows = jnp.einsum("nah,nhw->naw", wy, corr,
                          preferred_element_type=jnp.float32)
        win = jnp.einsum("naw,nbw->nab", rows.astype(level.dtype), wx,
                         preferred_element_type=jnp.float32)
        # channel order: x-offset-major (torch's meshgrid(dy,dx) quirk puts
        # the first window axis on x) -> transpose (a=y, b=x) to (b, a)
        win = win.transpose(0, 2, 1)
        out.append(win.reshape(B, H1, W1, (2 * r + 1) ** 2))
    return jnp.concatenate(out, axis=-1)


def lookup_corr_gather(pyr: CorrPyramid, coords: jnp.ndarray,
                       radius: int = 4) -> jnp.ndarray:
    """Gather-based reference lookup (kept for cross-checking the MXU path)."""
    r = radius
    B, H1, W1, _ = coords.shape
    n = B * H1 * W1
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dxx, dyy = jnp.meshgrid(d, d, indexing="ij")
    delta = jnp.stack([dxx, dyy], axis=-1)  # delta[i, j] = (d_i, d_j)

    out = []
    centroid = coords.reshape(n, 1, 1, 2)
    for i, level in enumerate(pyr.levels):
        c = centroid / (2.0 ** i) + delta[None]
        sampled = bilinear_sampler(level, c)  # (n, 2r+1, 2r+1, 1)
        out.append(sampled.reshape(B, H1, W1, (2 * r + 1) ** 2))
    return jnp.concatenate(out, axis=-1)


class EfficientCorr(NamedTuple):
    """On-the-fly correlation: no materialized (H1*W1)x(H2*W2) volume.

    Re-design of the reference's EfficientCorrBlock
    (ref: DCEIFlow/core/corr/raft_corr.py:121-172): keeps the feature-map
    pyramid instead of the volume pyramid — O(B*H*W*D*levels) memory instead
    of O(B*(H*W)^2). Preferable for large resolutions / batched training.
    """
    fmap1: jnp.ndarray          # (B, H, W, D)
    fmap2_levels: tuple         # each (B, h_l, w_l, D)


def build_efficient_corr(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                         num_levels: int = 4) -> EfficientCorr:
    from .pool import avg_pool2 as _pool

    levels = [fmap2.astype(jnp.float32)]
    for _ in range(num_levels - 1):
        levels.append(_pool(levels[-1]))
    return EfficientCorr(fmap1.astype(jnp.float32), tuple(levels))


def lookup_efficient_corr(ec: EfficientCorr, coords: jnp.ndarray,
                          radius: int = 4) -> jnp.ndarray:
    """Sample fmap2 windows and contract with fmap1 on the fly.

    Matches ``lookup_corr`` over a materialized volume exactly (same window
    order, same normalization); the inner product runs on the MXU per level.
    """
    from .warp import bilinear_sampler

    r = radius
    B, H1, W1, D = ec.fmap1.shape
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dxx, dyy = jnp.meshgrid(d, d, indexing="ij")
    delta = jnp.stack([dxx, dyy], axis=-1).reshape(-1, 2)  # ((2r+1)^2, 2)
    k = delta.shape[0]

    out = []
    for i, level in enumerate(ec.fmap2_levels):
        c = coords[:, :, :, None, :] / (2.0 ** i) + delta[None, None, None]
        # sample D-dim vectors at (B, H1, W1*k) positions
        sampled = bilinear_sampler(
            level, c.reshape(B, H1, W1 * k, 2))  # (B, H1, W1*k, D)
        sampled = sampled.reshape(B, H1, W1, k, D)
        corr = jnp.einsum("bhwd,bhwkd->bhwk", ec.fmap1, sampled,
                          preferred_element_type=jnp.float32)
        out.append(corr / jnp.sqrt(jnp.float32(D)))
    return jnp.concatenate(out, axis=-1)


def coords_grid(batch: int, h: int, w: int) -> jnp.ndarray:
    """(B, H, W, 2) grid of (x, y) pixel coords
    (ref: DCEIFlow/utils/sample_utils.py:55-58)."""
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    g = jnp.stack([gx, gy], axis=-1)
    return jnp.broadcast_to(g[None], (batch, h, w, 2))
