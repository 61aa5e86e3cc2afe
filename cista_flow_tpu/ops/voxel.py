"""Device-side event voxelization + preprocessing (jit-friendly, static shapes).

The ingestion kernel: N events ``[t, x, y, p]`` are bilinearly split in time
across ``num_bins`` and scatter-added into a (num_bins, H, W) grid
(ref: utils/event_process.py:15-72). On TPU the scatter runs as a single
``segment_sum`` over the flattened grid; variable event counts are handled
with fixed-capacity padded buffers + a validity mask (host windows events,
device voxelizes), keeping shapes static under jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def events_to_voxel_grid(
    t: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    p: jnp.ndarray,
    num_bins: int,
    height: int,
    width: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Voxelize a fixed-capacity event buffer.

    Args:
      t: (N,) float timestamps (any unit, only relative values matter)
      x, y: (N,) integer pixel coordinates
      p: (N,) polarity in {0, 1} or {-1, 1} (0 is mapped to -1, like the ref)
      valid: optional (N,) bool mask for padded buffers. Padded entries must
        also carry t == t of the last valid event or anything inside range —
        they are masked out regardless.

    Returns (num_bins, height, width) float32 voxel grid. Matches
    ``events_to_voxel_grid`` (ref: utils/event_process.py:15-72) exactly for
    the same event set.
    """
    t = t.astype(jnp.float32)
    n = t.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    # first/last *valid* timestamps
    big = jnp.float32(3.4e38)
    first = jnp.min(jnp.where(valid, t, big))
    last = jnp.max(jnp.where(valid, t, -big))
    dt = last - first
    dt = jnp.where(dt == 0, 1.0, dt)

    ts = (num_bins - 1) * (t - first) / dt
    pol = jnp.where(p > 0, 1.0, -1.0).astype(jnp.float32)

    tis = jnp.floor(ts)
    dts = ts - tis
    tis_i = tis.astype(jnp.int32)

    vals_left = pol * (1.0 - dts)
    vals_right = pol * dts

    size = num_bins * height * width
    base = x.astype(jnp.int32) + y.astype(jnp.int32) * width

    idx_l = base + tis_i * (width * height)
    ok_l = valid & (tis_i < num_bins) & (tis_i >= 0)
    idx_r = base + (tis_i + 1) * (width * height)
    ok_r = valid & ((tis_i + 1) < num_bins) & (tis_i >= 0)

    idx = jnp.concatenate([jnp.where(ok_l, idx_l, size), jnp.where(ok_r, idx_r, size)])
    vals = jnp.concatenate([
        jnp.where(ok_l, vals_left, 0.0),
        jnp.where(ok_r, vals_right, 0.0),
    ])
    grid = jax.ops.segment_sum(vals, idx, num_segments=size + 1)[:-1]
    return grid.reshape(num_bins, height, width)


@functools.partial(jax.jit, static_argnames=("mode", "filter_hot_pixel"))
def event_preprocess(
    voxel: jnp.ndarray, mode: str = "std", filter_hot_pixel: bool = False
) -> jnp.ndarray:
    """Voxel normalization (ref: utils/event_process.py:193-216).

    mode='std': zero-mean/unit-std over the NONZERO entries only, zeros stay
    zero. mode='maxmin': global min-max. Optional hot-pixel clamp
    (|v| > 25/num_bins -> 0).
    """
    num_bins = voxel.shape[0]
    if filter_hot_pixel:
        voxel = jnp.where(jnp.abs(voxel) > 25.0 / num_bins, 0.0, voxel)
    if mode == "maxmin":
        lo, hi = jnp.min(voxel), jnp.max(voxel)
        return (voxel - lo) / (hi - lo + 1e-8)
    if mode != "std":
        raise ValueError(mode)
    nonzero = voxel != 0
    num = jnp.sum(nonzero)
    mean = jnp.sum(voxel) / jnp.maximum(num, 1)
    stddev = jnp.sqrt(jnp.sum(voxel**2) / jnp.maximum(num, 1) - mean**2)
    normed = nonzero.astype(voxel.dtype) * (voxel - mean) / (stddev + 1e-8)
    return jnp.where(num > 0, normed, voxel)
