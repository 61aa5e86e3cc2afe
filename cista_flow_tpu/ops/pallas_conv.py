"""Pallas TPU kernel: stride-1 3x3 convolution as an in-VMEM im2col GEMM.

Why a kernel: XLA's TPU conv emitter contracts over Cin per (kh, kw) tap,
so a C->C 3x3 conv fills the MXU's 128-deep contraction and 128-wide
output with only C of each — measured MFU ~= (C/128)^2 for C < 128
(PERF.md "Conv MFU by channel count": 26% at 64ch, 7% at 32ch). The
model's hot pool (CISTA ISTA D/P, Dg, upsamp, encoder layer1) is exactly
64-128 channels, so round 1 left the conv segment at a ~26-35% plateau
(ref model shapes: e2v/e2v_model.py:20-47, raft_encoder.py:146-151).

Design: per (batch-element, row-chunk) grid step, build the im2col patch
matrix (bh*W, 9*C) in vregs from 9 statically-shifted slices of the
VMEM-resident padded image and issue ONE GEMM with contraction depth
9*C >= 576 — full MXU depth even at 64 channels, leaving only the
N=Cout lane limit. The patch build is 9 static sublane/lane-offset
copies (cheap VPU moves; contrast the corr kernel's *variable* per-lane
shifts), and the GEMM accumulates in f32 on the MXU.

The contraction axis is zero-padded to a multiple of 128 (the padded
weight rows are zeros, so the result is exact). Bias and an optional
relu are fused as an epilogue.

Differentiation: custom_vjp with the XLA convolution's own adjoint (both
paths compute the same function, so the XLA vjp is the exact adjoint) —
safe under jax.grad, though training defaults to the XLA conv (see
ops/conv.py gating; the axon remote-compile helper rejects Pallas in
large BPTT graphs, PERF.md "Training").
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default OFF: the standalone wins (1.43x @64ch, 1.10x @128ch vs the XLA
# conv, varied-input chip timing) do NOT survive in the real graph — e2e
# flagship A/B measured 491 fps (both widths) and 121 fps (64-only) vs 564
# fps with the kernel disabled. The losses are structural: pallas_call is a
# fusion barrier (XLA's conv fuses the pad, bias, activation and neighboring
# elementwise work; the kernel forces HBM round-trips on both sides) and the
# in-graph layouts feeding the GRU/encoder sites add transposes the
# standalone bench never paid. Kept as a measured, opt-in variant
# (CISTA_PALLAS_CONV=1) — the honest conclusion matches PERF.md "Conv MFU":
# beating XLA's conv emitter needs a fused multi-layer Mosaic pipeline, not
# a drop-in conv replacement.
ENABLED = _os.environ.get("CISTA_PALLAS_CONV", "0") == "1"
# Square-conv widths the dispatch may route here (see ops/conv.py), tuned by
# e2e A/B rather than per-op timing.
CHANNELS = tuple(
    int(s) for s in _os.environ.get("CISTA_PALLAS_CONV_CH", "64,128").split(",")
    if s.strip())
# Under differentiation the custom_vjp fwd runs the XLA conv by default, so
# training graphs contain no Pallas ops (the axon remote-compile helper 500s
# on large BPTT graphs with embedded kernels, PERF.md "Training"); flip on
# where the compiler is not proxied.
TRAIN_PALLAS = _os.environ.get("CISTA_TRAIN_PALLAS", "0") == "1"

_VMEM_LIMIT = 13 * 1024 * 1024    # scoped-vmem budget per grid step (chip limit 16M)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _step_bytes(bh: int, w: int, c: int, n: int, kp: int) -> int:
    """Scoped-VMEM estimate for one grid step. Vreg lanes pad the channel
    axis to 128, so the 9 materialized im2col parts cost max(c,128) lanes
    each — the dominant term at c<=64 (measured: the naive patch-only
    budget OOMs at 180x240x32)."""
    parts = 9 * bh * w * _round_up(c, 128) * 2
    patch = bh * w * kp * 2
    acc = bh * w * _round_up(n, 128) * 4
    out = bh * w * _round_up(n, 128) * 2
    return parts + patch + acc + out


def _pick_bh(h: int, w: int, c: int, n: int, kp: int):
    """Largest divisor of h whose grid step fits the scoped-VMEM budget
    alongside the resident padded image."""
    img = (h + 2) * _round_up(w + 2, 8) * _round_up(c, 128) * 2
    best = None
    for bh in range(1, h + 1):
        if h % bh:
            continue
        if img + _step_bytes(bh, w, c, n, kp) <= _VMEM_LIMIT:
            best = bh
    return best


def supported(x_shape, w_shape) -> bool:
    if len(w_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    b, h, w, c = x_shape
    cin, cout = w_shape[2], w_shape[3]
    if c != cin or c < 32 or w % 8 != 0 or h < 8:
        return False
    kp = _round_up(9 * c, 128)
    return _pick_bh(h, w, c, cout, kp) is not None


def _kernel(x_ref, w_ref, b_ref, o_ref, *, bh, w, c, kp, relu):
    hc = pl.program_id(1)
    row0 = hc * bh
    parts = []
    for dy in range(3):
        rows = x_ref[0, pl.dslice(row0 + dy, bh)]        # (bh, w+2, c)
        for dx in range(3):
            sl = rows[:, dx:dx + w, :]
            parts.append(sl.reshape(bh * w, c))
    if kp > 9 * c:
        parts.append(jnp.zeros((bh * w, kp - 9 * c), x_ref.dtype))
    patches = jnp.concatenate(parts, axis=-1)            # (bh*w, kp)
    acc = jax.lax.dot_general(
        patches, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + b_ref[0, :][None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(bh, w, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def _conv3x3_padded(xp, wk, bias, relu: bool, interpret: bool):
    """xp: (B, H+2, W+2, C) pre-padded input; wk: (KP, N) tap-major weights
    (zero rows beyond 9C); bias: (1, N) f32."""
    B, hp2, wp2, c = xp.shape
    h, w = hp2 - 2, wp2 - 2
    kp, n = wk.shape
    bh = _pick_bh(h, w, c, n, kp)
    kern = functools.partial(_kernel, bh=bh, w=w, c=c, kp=kp, relu=relu)
    return pl.pallas_call(
        kern,
        grid=(B, h // bh),
        in_specs=[
            pl.BlockSpec((1, hp2, wp2, c), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, n), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, n), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w, n), xp.dtype),
        interpret=interpret,
    )(xp, wk, bias)


def _prep(x, w, b, padding_mode):
    mode = "reflect" if padding_mode == "reflect" else "constant"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    c, n = w.shape[2], w.shape[3]
    kp = _round_up(9 * c, 128)
    wk = w.astype(x.dtype).reshape(9 * c, n)
    if kp > 9 * c:
        wk = jnp.pad(wk, ((0, kp - 9 * c), (0, 0)))
    return xp, wk, b.astype(jnp.float32).reshape(1, n)


def conv3x3(x, w, b=None, padding_mode="zeros", relu=False):
    """Exact stride-1 3x3 conv (+bias, optional fused relu) via the im2col
    Pallas kernel. Differentiable (XLA-adjoint custom_vjp). Check
    ``supported`` before calling; off-TPU callers should use the XLA conv."""
    if b is None:
        b = jnp.zeros((w.shape[3],), jnp.float32)
    return _conv3x3_vjp(x, w, b, padding_mode, relu)


def _run(x, w, b, padding_mode, relu):
    xp, wk, bias = _prep(x, w, b, padding_mode)
    interpret = jax.default_backend() != "tpu"
    return _conv3x3_padded(xp, wk, bias, relu, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_vjp(x, w, b, padding_mode, relu):
    return _run(x, w, b, padding_mode, relu)


def _xla_ref(x, w, b, padding_mode, relu):
    mode = "reflect" if padding_mode == "reflect" else "constant"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    out = jax.lax.conv_general_dilated(
        xp, w.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(out.dtype)
    return jnp.maximum(out, 0) if relu else out


def _fwd(x, w, b, padding_mode, relu):
    run = _run if TRAIN_PALLAS else _xla_ref
    return run(x, w, b, padding_mode, relu), (x, w, b)


def _bwd(padding_mode, relu, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _xla_ref(x, w, b, padding_mode, relu),
                     x, w, b)
    return vjp(g)


_conv3x3_vjp.defvjp(_fwd, _bwd)
