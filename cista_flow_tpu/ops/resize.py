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

import functools
import os as _os

import jax
import jax.numpy as jnp

# x2-upsample formulation: 0 = interpolation-matrix einsums, 1 = phase lerps
# on H + matrix on W, 2 = phase lerps on both axes. Default 0: despite ~45x
# fewer MACs, both phase variants measured e2e-NEGATIVE at the flagship
# (588 -> 491 both-axes, 588 -> 573 H-only) — the stack/reshape interleave
# and border concats defeat XLA's fusion with the following conv, while the
# constant-matrix contractions stay inside one fusion (PERF.md).
_X2_PHASE_MODE = int(_os.environ.get("CISTA_RESIZE_PHASE", "0"))


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


@functools.lru_cache(maxsize=64)
def _interp_matrix_np(out_size: int, in_size: int, align_corners: bool):
    """Static (out, in) bilinear interpolation matrix (2 nonzeros per row).
    Pure numpy (safe to call under tracing; torch source-coord semantics)."""
    import numpy as np

    d = np.arange(out_size, dtype=np.float32)
    if align_corners:
        scale = np.float32((in_size - 1) / (out_size - 1)) if out_size > 1 \
            else np.float32(0.0)
        src = d * scale
    else:
        scale = np.float32(in_size / out_size)
        src = np.maximum(d * scale + (np.float32(0.5) * scale - np.float32(0.5)),
                         np.float32(0.0))
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), i0] = 1.0 - w1
    # i1 may equal i0 at the edge: accumulate
    m[np.arange(out_size), i1] += w1
    return m


@functools.lru_cache(maxsize=64)
def _reflect_rows(out_size: int, pad: int):
    """Row-index vector that appends a reflect pad to a resize matrix:
    padded output row -k equals output row k (torch reflect semantics)."""
    return (list(range(pad, 0, -1)) + list(range(out_size))
            + list(range(out_size - 2, out_size - 2 - pad, -1)))


def _resize_x2_phases(x: jnp.ndarray, reflect_pad: int) -> jnp.ndarray:
    """x2 bilinear upsample (align_corners=False) as periodic 2-tap phase
    lerps instead of interpolation-matrix contractions.

    With scale 2 the torch source coord is o/2 - 0.25 (clamped at 0), so
    every even output row is 0.25*x[i-1] + 0.75*x[i] and every odd row
    0.75*x[i] + 0.25*x[i+1], with edge-clamped shifts reproducing torch's
    boundary clamping exactly. Pure shifted lerps + interleave: ~45x fewer
    MACs than the dense-matrix form (measured 3.4 ms -> sub-ms at the CISTA
    decoder's 90x120x64 shape). ``reflect_pad=1`` appends the reflected
    border (pad row -1 == output row 1 == odd[0]; pad row 2H == even[H-1]).
    """
    xf = x.astype(jnp.float32)
    out = _resize_x2_phases_axis(_resize_x2_phases_axis(xf, 1, reflect_pad),
                                 2, reflect_pad)
    return out.astype(x.dtype)


def _resize_x2_phases_axis(t: jnp.ndarray, axis: int,
                           reflect_pad: int) -> jnp.ndarray:
    n = t.shape[axis]
    sl = functools.partial(jax.lax.slice_in_dim, t, axis=axis)
    lo = jnp.concatenate([sl(0, 1), sl(0, n - 1)], axis)   # t[i-1] clamped
    hi = jnp.concatenate([sl(1, n), sl(n - 1, n)], axis)   # t[i+1] clamped
    even = 0.25 * lo + 0.75 * t
    odd = 0.75 * t + 0.25 * hi
    inter = jnp.stack([even, odd], axis=axis + 1)
    shp = list(t.shape)
    shp[axis] *= 2
    inter = inter.reshape(shp)
    if reflect_pad:
        first = jax.lax.slice_in_dim(odd, 0, 1, axis=axis)   # output row 1
        last = jax.lax.slice_in_dim(even, n - 1, n, axis=axis)
        inter = jnp.concatenate([first, inter, last], axis)
    return inter


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False,
                    reflect_pad: int = 0) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to ``out_hw = (H_out, W_out)``.

    Matches ``torch.nn.functional.interpolate(mode='bilinear')`` in both
    align_corners modes (separable).

    TPU design: shapes are static, so the per-axis interpolation is a pair of
    small constant-matrix contractions on the MXU instead of gathers (TPU
    gathers cost ~10ns per site; these matrices have 2 nonzeros per row).

    ``reflect_pad``: emit the result already reflect-padded by that many
    pixels on each spatial side — identical to ``jnp.pad(resize(x),
    mode='reflect')`` but free: reflected border rows are just duplicated
    rows of the constant interpolation matrices, so no separate full-tensor
    pad materialization happens (a following VALID conv fuses the rest).
    """
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    _, h_in, w_in, _ = x.shape
    if h_out == h_in and w_out == w_in and not reflect_pad:
        return x
    dtype = x.dtype
    if (_X2_PHASE_MODE and not align_corners and h_out == 2 * h_in
            and w_out == 2 * w_in and reflect_pad <= 1):
        if _X2_PHASE_MODE == 2:
            return _resize_x2_phases(x, reflect_pad)
        # H by phase lerps (outer-dim interleave is cheap); W stays on the
        # interpolation matrix (sublane interleave is an expensive relayout)
        xh = _resize_x2_phases_axis(x.astype(jnp.float32), 1, reflect_pad)
        mw = _interp_matrix_np(w_out, w_in, False)
        if reflect_pad:
            import numpy as np
            mw = mw[np.asarray(_reflect_rows(w_out, reflect_pad))]
        return jnp.einsum("ow,bhwc->bhoc", jnp.asarray(mw), xh).astype(dtype)
    xf = x.astype(jnp.float32)

    import numpy as np
    if h_out != h_in or reflect_pad:
        mh = _interp_matrix_np(h_out, h_in, align_corners)
        if reflect_pad:
            mh = mh[np.asarray(_reflect_rows(h_out, reflect_pad))]
        xf = jnp.einsum("oh,bhwc->bowc", jnp.asarray(mh), xf)
    if w_out != w_in or reflect_pad:
        mw = _interp_matrix_np(w_out, w_in, align_corners)
        if reflect_pad:
            mw = mw[np.asarray(_reflect_rows(w_out, reflect_pad))]
        xf = jnp.einsum("ow,bhwc->bhoc", jnp.asarray(mw), xf)
    return xf.astype(dtype)


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
