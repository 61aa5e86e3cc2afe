"""Bilinear resize with exact torch ``F.interpolate`` semantics (NHWC).

The reference mixes both align_corners conventions:
* flow down/up-scaling uses ``align_corners=True``
  (ref: e2v/e2v_model.py:190, DCEIFlow/utils/sample_utils.py:61-96)
* the CISTA decoder's x2 upsample uses ``align_corners=False``
  (ref: e2v/base_layers.py:200).

Both are reproduced here exactly; parity is pinned by tests/test_ops_resize.py
against torch CPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """Float source coordinate for each output index (torch semantics)."""
    d = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        return d * scale
    scale = in_size / out_size
    # torch clamps negative source coords to 0 (upsampling half-pixel rule)
    return jnp.maximum(d * scale + (0.5 * scale - 0.5), 0.0)


def _gather_axis_weights(out_size: int, in_size: int, align_corners: bool):
    src = _source_coords(out_size, in_size, align_corners)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, w1


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to ``out_hw = (H_out, W_out)``.

    Matches ``torch.nn.functional.interpolate(mode='bilinear')`` bit-for-bit in
    both align_corners modes (separable: rows then columns).
    """
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    _, h_in, w_in, _ = x.shape
    if h_out == h_in and w_out == w_in:
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    y0, y1, wy = _gather_axis_weights(h_out, h_in, align_corners)
    x0, x1, wx = _gather_axis_weights(w_out, w_in, align_corners)

    # rows
    top = jnp.take(xf, y0, axis=1)
    bot = jnp.take(xf, y1, axis=1)
    rows = top + (bot - top) * wy[None, :, None, None]
    # cols
    left = jnp.take(rows, x0, axis=2)
    right = jnp.take(rows, x1, axis=2)
    out = left + (right - left) * wx[None, None, :, None]
    return out.astype(dtype)


def resize_flow(flow: jnp.ndarray, out_hw, scale: float | None = None) -> jnp.ndarray:
    """Resize a flow field (NHWC, C=2) and scale its magnitude.

    Mirrors the reference's ``upflow{2,4,8,16}`` / ``downflow{2,4,8}`` family
    (ref: DCEIFlow/utils/sample_utils.py:61-96): bilinear with
    align_corners=True, flow values multiplied by the spatial scale factor.
    If ``scale`` is None, uses ``out_h / in_h``.
    """
    _, h_in, _, _ = flow.shape
    if scale is None:
        scale = out_hw[0] / h_in
    return resize_bilinear(flow, out_hw, align_corners=True) * jnp.asarray(
        scale, flow.dtype
    )


def upflow(flow: jnp.ndarray, factor: int) -> jnp.ndarray:
    """``upflow{factor}`` (ref: DCEIFlow/utils/sample_utils.py:61-78)."""
    _, h, w, _ = flow.shape
    return resize_flow(flow, (h * factor, w * factor), scale=float(factor))


def downflow(flow: jnp.ndarray, factor: int) -> jnp.ndarray:
    """``downflow{factor}`` (ref: DCEIFlow/utils/sample_utils.py:81-91)."""
    _, h, w, _ = flow.shape
    return resize_flow(flow, (h // factor, w // factor), scale=1.0 / factor)


def interpolate_scale(x: jnp.ndarray, scale_factor: float, align_corners: bool) -> jnp.ndarray:
    """``F.interpolate(x, scale_factor=...)`` — output size floor(in * scale)."""
    _, h, w, _ = x.shape
    return resize_bilinear(
        x, (int(h * scale_factor), int(w * scale_factor)), align_corners=align_corners
    )
