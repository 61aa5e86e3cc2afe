"""Flow Warp Loss (FWL): variance of the flow-compensated event image.

ref: loss.py:27-83 (``voxel_warping_flow_loss``). Each voxel bin i is warped
along ``i/(C-1) * flow`` (reversed: ``1 - i/(C-1)``), the warped bins are
summed, and the loss is the (unbiased) variance of that image. The FWL eval
metric is var(warped) / var(unwarped) (ref: test_wo_flow.py:161).

Grid normalization quirk preserved exactly: ``2*x/W - 1`` (W, not W-1),
align_corners=True, zeros padding (ref: loss.py:62-66).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.warp import grid_sample


def voxel_warping_flow_loss(voxel: jnp.ndarray, flow: jnp.ndarray,
                            reverse_time: bool = False) -> jnp.ndarray:
    """voxel: (B, H, W, C); flow: (B, H, W, 2). Returns scalar variance."""
    if reverse_time:
        flow = -flow
    B, H, W, C = voxel.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    inc = 1.0 / (C - 1.0)
    warped_sum = jnp.zeros((B, H, W, 1), jnp.float32)
    for i in range(C):
        ratio = (1.0 - i * inc) if reverse_time else i * inc
        gx = (2.0 * (xx + flow[..., 0] * ratio)) / W - 1.0
        gy = (2.0 * (yy + flow[..., 1] * ratio)) / H - 1.0
        grid = jnp.stack([gx, gy], axis=-1)
        warped_sum = warped_sum + grid_sample(
            voxel[..., i:i + 1], grid, align_corners=True, padding_mode="zeros")
    # torch .var() is unbiased
    n = warped_sum.size
    return jnp.var(warped_sum) * (n / (n - 1))


def fwl_metric(voxel: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """FWL = var(warped along flow) / var(warped along zero flow)."""
    return voxel_warping_flow_loss(voxel, flow) / voxel_warping_flow_loss(
        voxel, jnp.zeros_like(flow))
