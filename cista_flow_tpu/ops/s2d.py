"""Space-to-depth conv reformulations for the pass-bound full-res segment.

CISTA's full-resolution convs (the fused We/Wi head at Cin=6 and the
stride-2 W0) are MXU *pass*-bound, not FLOP-bound: at (B,180,240,64) the
output occupies B*H*W/8 sublane rows regardless of contraction depth, so
XLA's emitter runs them at 2-5%% MFU (measured: the head costs ~1.05 ms
whether Cin is 6 or 128 — see PERF.md "Full-res pass-bound analysis").

Reformulation: pack 2x2 spatial phases onto the lane axis
(``space_to_depth``) and recompose the 3x3 kernels as block-window convs:

* stride-1 conv, s2d in -> s2d out: a 3x3 *block* conv over (4*Cin) ->
  (4*Cout) channels. Dense MACs inflate (zeros where a phase-tap falls
  outside the original 3x3) but the contraction is 9-36x deeper and the
  lanes are full, so the pass count drops ~4x.
* stride-2 conv, s2d in -> plain half-res out: a 2x2 block conv
  (4*Cin) -> Cout. The output leaves the s2d domain exactly where the
  model drops to half resolution, so no depth_to_space unpack is needed.

Reflect padding: reflect-pad-1 in the original domain equals
EDGE-replicate-pad-1 in the block domain on every slot the 3x3 kernel can
touch (pad block row (-2,-1): slot -1 must be original row 1 = phase-1 of
block 0, which is exactly what edge replication provides; slot -2 only
multiplies zero weights). So the padded conv stays a single fused XLA
conv with no strip corrections.

Everything here is plain XLA (no Pallas): fully differentiable, exact in
f32 up to summation order, and fuses with neighbors. Used by
models/cista_lstc.py on the bf16 TPU path (CISTA_S2D=0 opts out).

ref: the ops this reformulates are e2v/e2v_model.py:69-75 (We/Wi/W0).
"""
from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

DIMS = ("NHWC", "HWIO", "NHWC")

ENABLED = _os.environ.get("CISTA_S2D", "1") == "1"

# Decoder-side s2d (upsample_conv_s2d + final block conv): chip-measured
# e2e NEGATIVE — 641 fps (phase-plane resize) / 654 (matrix resize +
# pack) vs 676 with the decoder left on the matrix-resize + fused VALID
# conv path. Unlike the head, the decoder's full-res conv already rides a
# single fusion with the resize einsums and the following sigmoid; the
# block recomposition only adds pack/unpack relayouts. Kept as a tested
# opt-in (CISTA_S2D_DECODER=1) for other shape regimes.
DECODER = _os.environ.get("CISTA_S2D_DECODER", "0") == "1"


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order (py, px, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, Hb, Wb, 4C) -> (B, 2*Hb, 2*Wb, C); inverse of space_to_depth."""
    b, hb, wb, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hb, wb, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * hb, 2 * wb, c)


import numpy as _np


def _recompose_s2d_s2d(w3: jnp.ndarray) -> jnp.ndarray:
    """3x3 HWIO kernel -> (3, 3, 4*Cin, 4*Cout) block kernel for a
    stride-1 conv with both input and output in s2d form.

    Output block Y needs original rows 2Y-1 .. 2Y+2, i.e. block rows
    Y-1..Y+1; a phase-tap maps to original tap dy = 2*byi + py_in - py_out
    - 1 (zero when outside the 3x3 support). Built as ONE gather with
    constant indices into the zero-padded kernel (this may run inside a
    scan body, where XLA cannot hoist it — keep it a handful of ops)."""
    kh, kw, cin, cout = w3.shape
    w3p = jnp.pad(w3, ((2, 2), (2, 2), (0, 0), (0, 0)))
    b_, pi, po = _np.meshgrid(_np.arange(3), _np.arange(2), _np.arange(2),
                              indexing="ij")
    d = 2 * (b_ - 1) + pi - po + 1 + 2          # (3, 2, 2) in [0, 6]
    w2 = w3p[d[:, None, :, None, :, None],
             d[None, :, None, :, None, :]]       # (3,3,piy,pix,poy,pox,ci,co)
    w2 = w2.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return w2.reshape(3, 3, 4 * cin, 4 * cout)


def _recompose_s2d_plain_s2(w3: jnp.ndarray) -> jnp.ndarray:
    """3x3 HWIO kernel -> (2, 2, 4*Cin, Cout) block kernel for a stride-2
    pad-1 conv whose input is s2d and whose output is the plain half-res
    map. Output Y needs original rows 2Y-1..2Y+1 = block rows Y-1..Y;
    dy = 2*byi + py_in - 1."""
    kh, kw, cin, cout = w3.shape
    w3p = jnp.pad(w3, ((1, 1), (1, 1), (0, 0), (0, 0)))
    b_, pi = _np.meshgrid(_np.arange(2), _np.arange(2), indexing="ij")
    d = 2 * (b_ - 1) + pi + 1 + 1                # (2, 2) in [0, 4]
    w2 = w3p[d[:, None, :, None],
             d[None, :, None, :]]                # (2,2,piy,pix,ci,co)
    return w2.reshape(2, 2, 4 * cin, cout)


def conv3x3_reflect_s2d(xb: jnp.ndarray, w3: jnp.ndarray,
                        b: jnp.ndarray | None,
                        cin_perm=None) -> jnp.ndarray:
    """Stride-1 reflect-pad-1 3x3 conv, s2d in -> s2d out.

    xb: (B, Hb, Wb, 4*Cin); returns (B, Hb, Wb, 4*Cout).
    ``cin_perm``: optional constant permutation when xb's channels are NOT
    in the canonical (py, px, c) order — w2's cin axis is re-gathered so
    w2_new[..., t, :] = w2[..., cin_perm[t], :] (e.g. pre-packed event
    voxels concatenated with a separately packed image plane)."""
    w2 = _recompose_s2d_s2d(w3).astype(xb.dtype)
    if cin_perm is not None:
        w2 = w2[:, :, _np.asarray(cin_perm), :]
    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        xp, w2, (1, 1), "VALID", dimension_numbers=DIMS)
    if b is not None:
        out = out + jnp.tile(b, 4).astype(out.dtype)
    return out


def conv3x3s2_reflect_s2d_to_plain(xb: jnp.ndarray, w3: jnp.ndarray,
                                   b: jnp.ndarray | None) -> jnp.ndarray:
    """Stride-2 reflect-pad-1 3x3 conv, s2d in -> PLAIN half-res out.

    xb: (B, Hb, Wb, 4*Cin); returns (B, Hb, Wb, Cout)."""
    w2 = _recompose_s2d_plain_s2(w3).astype(xb.dtype)
    xp = jnp.pad(xb, ((0, 0), (1, 0), (1, 0), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        xp, w2, (1, 1), "VALID", dimension_numbers=DIMS)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Decoder side: the x2 bilinear upsample emitted directly in s2d phase form
# (no full-res interleave — the relayout that made the earlier
# CISTA_RESIZE_PHASE modes e2e-negative never happens), followed by the
# upsample conv as a VALID 2x2 block conv with NO padding at all: the
# resize's folded reflect-pad-1 makes the padded map (2H+2, 2W+2) — even
# dims, so its blocks tile it exactly.
# ref ops replaced: e2v/base_layers.py:168-212 (UpsampleConvLayer) +
# e2v/e2v_model.py:94-96 (final conv + sigmoid).
# ---------------------------------------------------------------------------


def _x2_phase_planes(t: jnp.ndarray, axis: int):
    """even/odd output planes of the x2 align_corners=False lerp along
    ``axis`` (torch semantics: even[i] = 0.25 t[i-1] + 0.75 t[i], odd[i] =
    0.75 t[i] + 0.25 t[i+1], edge-clamped)."""
    import functools as _ft
    n = t.shape[axis]
    sl = _ft.partial(jax.lax.slice_in_dim, t, axis=axis)
    lo = jnp.concatenate([sl(0, 1), sl(0, n - 1)], axis)
    hi = jnp.concatenate([sl(1, n), sl(n - 1, n)], axis)
    even = 0.25 * lo + 0.75 * t
    odd = 0.75 * t + 0.25 * hi
    return even, odd


def _pad_phase_planes(even: jnp.ndarray, odd: jnp.ndarray, axis: int):
    """Reflect-pad-1 of the interleaved map, expressed on the phase planes:
    padded blocks k=0..n cover padded rows (2k-1, 2k), so phase0 =
    [odd[0] | odd[0..n-1]] (row -1 reflects to row 1 = odd[0]) and
    phase1 = [even[0..n-1] | even[n-1]] (row 2n reflects to 2n-2)."""
    import functools as _ft
    n = even.shape[axis]
    slo = _ft.partial(jax.lax.slice_in_dim, odd, axis=axis)
    sle = _ft.partial(jax.lax.slice_in_dim, even, axis=axis)
    ph0 = jnp.concatenate([slo(0, 1), odd], axis)          # (n+1)
    ph1 = jnp.concatenate([even, sle(n - 1, n)], axis)     # (n+1)
    return ph0, ph1


def resize_x2_reflect_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample (align_corners=False) + reflect-pad-1, emitted
    in s2d block form: (B, H, W, C) -> (B, H+1, W+1, 4C), channel order
    (py, px, c). Exactly equals space_to_depth(reflect_pad_1(resize2x(x)))."""
    xf = x.astype(jnp.float32)
    ey, oy = _x2_phase_planes(xf, 1)
    y0, y1 = _pad_phase_planes(ey, oy, 1)                  # (B, H+1, W, C)
    planes = []
    for yp in (y0, y1):
        ex, ox = _x2_phase_planes(yp, 2)
        x0, x1 = _pad_phase_planes(ex, ox, 2)              # (B, H+1, W+1, C)
        planes += [x0, x1]
    return jnp.concatenate(planes, axis=-1).astype(x.dtype)


def _recompose_padded_s2d_s2d_valid(w3: jnp.ndarray) -> jnp.ndarray:
    """3x3 HWIO kernel -> (2, 2, 4*Cin, 4*Cout) block kernel for a VALID
    conv over the already-padded s2d map from ``resize_x2_reflect_s2d``.

    Padded block k holds padded rows (2k-1, 2k); output row 2Y+po's VALID
    window is padded rows 2Y+po-1..2Y+po+1, i.e. blocks Y..Y+1 with tap
    dy = 2*byi + pin - po (zero outside [0, 2])."""
    kh, kw, cin, cout = w3.shape
    w3p = jnp.pad(w3, ((1, 1), (1, 1), (0, 0), (0, 0)))
    b_, pi, po = _np.meshgrid(_np.arange(2), _np.arange(2), _np.arange(2),
                              indexing="ij")
    d = 2 * b_ + pi - po + 1                     # (2, 2, 2) in [0, 4]
    w2 = w3p[d[:, None, :, None, :, None],
             d[None, :, None, :, None, :]]       # (2,2,piy,pix,poy,pox,ci,co)
    w2 = w2.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return w2.reshape(2, 2, 4 * cin, 4 * cout)


def upsample_conv_s2d(xhalf: jnp.ndarray, w3: jnp.ndarray,
                      b: jnp.ndarray | None) -> jnp.ndarray:
    """UpsampleConvLayer core in s2d form: x2 bilinear (align_corners=False)
    -> reflect pad 1 -> 3x3 VALID conv, returning the FULL-RES output in
    s2d form (B, H, W, 4*Cout) for (B, H, W, Cin) half-res input."""
    if _os.environ.get("CISTA_S2D_DEC_MATRIX", "0") == "1":
        from .resize import resize_bilinear
        _, hh, ww, _ = xhalf.shape
        xb = space_to_depth(resize_bilinear(
            xhalf, (2 * hh, 2 * ww), align_corners=False, reflect_pad=1))
    else:
        xb = resize_x2_reflect_s2d(xhalf)
    w2 = _recompose_padded_s2d_s2d_valid(w3).astype(xb.dtype)
    out = jax.lax.conv_general_dilated(
        xb, w2, (1, 1), "VALID", dimension_numbers=DIMS)
    if b is not None:
        out = out + jnp.tile(b, 4).astype(out.dtype)
    return out
