"""Fused ISTA loop v2: whole-frame VMEM residency + im2col GEMMs.

The CISTA sparse-coding loop runs ``depth`` (=5) weight-tied iterations of
  z <- softshrink(P(x1 - D(z)) + z, Lambda)
with two 3x3 reflect-padded convs per iteration (ref: e2v/e2v_model.py:81-87).
Profiled under XLA this segment costs ~10 ms of the 63 ms flagship step
(convs at the 64-ch MFU plateau + five ``maximum_subtract`` softshrink
fusions, PERF.md).

v1 (`ops/pallas_ista.py`) lost 6x to XLA because each conv was 9 per-tap
matmuls with contraction depth C — exactly the formulation that leaves the
MXU idle. v2 keeps v1's residency win (x1, z, weights and every intermediate
stay in VMEM for all ``depth`` iterations — zero HBM round-trips between the
10 convs) but computes each conv the way `ops/pallas_conv.py` measured 1.43x
over XLA standalone: per row-chunk, build the im2col patch matrix
(bh*W, 9*Cin) from 9 statically-shifted slices of the padded scratch and
issue ONE GEMM with contraction depth 9*Cin (1152 for D, 576 for P) — full
MXU depth at these channel counts. Bias, the x1 subtraction, the +z shortcut
and the softshrink proximal all run as f32 epilogues in-register.

Layout per grid step (one batch element):
  zpad  (H+2, W+2, 2C)  -- z lives HERE between iterations (interior) with
                           reflect borders refreshed at each iteration start
  xpad  (H+2, W+2, C)   -- x1 - D(z) staged for P's conv
  x1_v  (H, W, C)       -- DMA'd once from HBM/ANY
Inputs/outputs ride ANY memory space with manual DMAs: grid-indexed VMEM
blocks would be double-buffered by Mosaic (~6 MB x 2 extra), blowing VMEM.

Differentiation: fused_ista_v2 carries a custom_vjp whose backward is the
XLA loop's own adjoint (both compute the same function); under autodiff the
forward also runs the XLA loop by default so training graphs contain no
Pallas ops (same policy as ops/pallas_conv.py; the axon remote-compile
helper rejects kernels in large BPTT graphs, PERF.md "Training").

VERDICT (measured on-chip, PERF.md "Fused ISTA v2"): honest e2e NEGATIVE —
default OFF, opt in with CISTA_PALLAS_ISTA=1. Standalone the kernel wins
(7.75 vs 11.71 ms per 5-iter loop at flagship shapes), but that baseline is
inflated by the micro-bench's fusion-breaking normalize: in the real
CISTA-alone graph XLA fuses the softshrink proximal into the convs and the
whole ISTA segment costs only ~7.0 ms, so the 5.83 ms in-graph kernel saves
~1.2 ms — and its graph boundary costs ~3.5 ms (reflect pads around W0/Dg
losing their conv fusions +1.6, the Dg conv losing its epilogue fusion
+0.8, extra copies +0.4, the lane-128 channel pad of x1 +0.27). Net
CISTA-alone 23.3 vs 20.8 ms/step at batch 32. Same failure mode as
ops/pallas_conv.py: a standalone win erased by XLA fusion barriers.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn import layers as L

ENABLED = _os.environ.get("CISTA_PALLAS_ISTA", "0") == "1"

_VMEM_LIMIT = 13 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_bh(h: int, w: int, c: int, with_dg: bool = False) -> int | None:
    """Largest divisor of h whose per-chunk transients + resident buffers fit
    the scoped-VMEM budget. Lane padding: channel axes pad to 128.
    ``with_dg`` reserves the Dg weight buffer (v3 kernel only) — the v2
    kernel carries no Dg weights, so its budget excludes it."""
    lanes2c = _round_up(2 * c, 128)
    lanesc = _round_up(c, 128)
    resident = (
        (h + 2) * _round_up(w + 9, 16) * lanes2c * 2      # zpad (XOFF interior)
        + (h + 2) * _round_up(w + 9, 16) * lanesc * 2     # xpad
        + h * _round_up(w, 16) * _round_up(c, 128) * 2    # x1_v (lane-padded)
        + _round_up(9 * 2 * c, 128) * lanesc * 2          # D weights
        + _round_up(9 * c, 128) * lanes2c * 2             # P weights
        + (_round_up(9 * 2 * c, 128) * lanesc * 2 if with_dg else 0)  # Dg (v3)
    )
    best = None
    for bh in range(1, h + 1):
        if h % bh:
            continue
        trans = (
            9 * bh * w * lanes2c * 2      # D im2col parts (worst of the two)
            + bh * w * _round_up(9 * 2 * c, 128) * 2   # D patches
            + bh * w * lanes2c * 4        # f32 accumulator
        )
        if resident + trans <= _VMEM_LIMIT:
            best = bh
    return best


def supported(x1_shape, z_shape, with_dg: bool = False) -> bool:
    b, h, w, c = x1_shape
    if z_shape != (b, h, w, 2 * c):
        return False
    if c < 32 or w % 8 != 0 or h < 8:
        return False
    return _pick_bh(h, w, c, with_dg=with_dg) is not None


# Interior column offset inside the padded scratches. 8 (not 1) so that the
# interior slice is sublane-tile aligned: Mosaic requires DMA slice offsets
# divisible by the 8-sublane tiling, and aligned vreg stores are cheaper than
# offset-1 ones. Columns [0, XOFF-1) are unused; the left reflect column
# lives at XOFF-1.
XOFF = 8


def _fill_borders(pad, h, w):
    """1px reflect borders around the interior at [1:h+1, XOFF:XOFF+w)
    (torch ReflectionPad2d(1)): pad row 0 := src row 1 (= pad row 2)."""
    pad[0, XOFF:XOFF + w, :] = pad[2, XOFF:XOFF + w, :]
    pad[h + 1, XOFF:XOFF + w, :] = pad[h - 1, XOFF:XOFF + w, :]
    pad[:, XOFF - 1, :] = pad[:, XOFF + 1, :]
    pad[:, XOFF + w, :] = pad[:, XOFF + w - 2, :]


def _patches(pad, r0, bh, w):
    """im2col rows for output rows [r0, r0+bh): (bh*w, 9*Cin) from 9
    shifted slices of the padded scratch. r0 may be a traced index — row
    offsets ride the untiled leading dim; the column shifts are static."""
    parts = []
    for dy in range(3):
        rows = pad[pl.dslice(r0 + dy, bh)]        # (bh, XOFF+w+1, cin)
        for dx in range(3):
            sl = rows[:, XOFF - 1 + dx:XOFF - 1 + dx + w, :]
            parts.append(sl.reshape(bh * w, sl.shape[-1]))
    return jnp.concatenate(parts, axis=-1)


def _load_inputs(x1_hbm, z_hbm, x1_v, zpad, sem, h, w):
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(x1_hbm.at[b], x1_v, sem)
    cp.start()
    cp.wait()
    cp = pltpu.make_async_copy(
        z_hbm.at[b], zpad.at[1:h + 1, XOFF:XOFF + w, :], sem)
    cp.start()
    cp.wait()


def _ista_loop(x1_v, zpad, xpad, dw_ref, db_ref, pw_ref, pb_ref, lam_ref,
               depth, h, w, c, bh):
    """Run ``depth`` tied ISTA iterations in-place on zpad's interior."""
    dtype = zpad.dtype
    db = db_ref[0].astype(jnp.float32)
    pb = pb_ref[0].astype(jnp.float32)
    lam = lam_ref[0].astype(jnp.float32)

    # fori_loops (not Python unrolls) keep the Mosaic program ~90x smaller:
    # depth x 2 x (h/bh) unrolled GEMM bodies time out the remote compiler.
    def _d_chunk(ci, _):
        # D pass: xpad interior <- x1 - (D * z + db)
        r0 = ci * bh
        pat = _patches(zpad, r0, bh, w)                       # (bh*w, 18c)
        acc = jax.lax.dot_general(
            pat, dw_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + db
        x1c = x1_v[pl.dslice(r0, bh), :, :c].reshape(bh * w, c)
        xpad[pl.dslice(1 + r0, bh), XOFF:XOFF + w, :] = (
            (x1c.astype(jnp.float32) - acc)
            .reshape(bh, w, c).astype(dtype))
        return 0

    def _p_chunk(ci, _):
        # P pass + shortcut + softshrink: zpad interior <- prox(P*x + z)
        r0 = ci * bh
        pat = _patches(xpad, r0, bh, w)                       # (bh*w, 9c)
        acc = jax.lax.dot_general(
            pat, pw_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + pb
        zc = (zpad[pl.dslice(1 + r0, bh), XOFF:XOFF + w, :]
              .reshape(bh * w, 2 * c).astype(jnp.float32))
        pre = acc + zc
        znew = (jnp.maximum(pre - lam, 0.0)
                - jnp.maximum(-pre - lam, 0.0))
        zpad[pl.dslice(1 + r0, bh), XOFF:XOFF + w, :] = (
            znew.reshape(bh, w, 2 * c).astype(dtype))
        return 0

    def _iteration(_, carry):
        _fill_borders(zpad, h, w)
        jax.lax.fori_loop(0, h // bh, _d_chunk, 0)
        _fill_borders(xpad, h, w)
        jax.lax.fori_loop(0, h // bh, _p_chunk, 0)
        return carry

    jax.lax.fori_loop(0, depth, _iteration, 0)


def _kernel(x1_hbm, z_hbm, dw_ref, db_ref, pw_ref, pb_ref, lam_ref, out_hbm,
            x1_v, zpad, xpad, sem, *, depth, h, w, c, bh):
    # x1 arrives lane-padded to 128 channels (Mosaic rejects DMA slices whose
    # channel dim is not 128-aligned); only [..., :c] is real.
    b = pl.program_id(0)
    _load_inputs(x1_hbm, z_hbm, x1_v, zpad, sem, h, w)
    _ista_loop(x1_v, zpad, xpad, dw_ref, db_ref, pw_ref, pb_ref, lam_ref,
               depth, h, w, c, bh)
    cp = pltpu.make_async_copy(
        zpad.at[1:h + 1, XOFF:XOFF + w, :], out_hbm.at[b], sem)
    cp.start()
    cp.wait()


def _kernel_dg(x1_hbm, z_hbm, dw_ref, db_ref, pw_ref, pb_ref, lam_ref,
               gw_ref, gb_ref, out_hbm, rec_hbm,
               x1_v, zpad, xpad, sem, *, depth, h, w, c, bh):
    """v3: ISTA loop + the Dg conv (relu(conv3x3(z))) fused as a tail pass.

    Dg's input is exactly the kernel's resident z (reflect borders already
    refreshable in-VMEM), and its output (h, w, c) reuses xpad's interior as
    scratch — absorbing the boundary ops the v2 post-mortem itemized (the
    standalone reflect-pad of Dg's input and Dg's lost epilogue fusion)."""
    b = pl.program_id(0)
    _load_inputs(x1_hbm, z_hbm, x1_v, zpad, sem, h, w)
    _ista_loop(x1_v, zpad, xpad, dw_ref, db_ref, pw_ref, pb_ref, lam_ref,
               depth, h, w, c, bh)

    cp = pltpu.make_async_copy(
        zpad.at[1:h + 1, XOFF:XOFF + w, :], out_hbm.at[b], sem)
    cp.start()
    cp.wait()

    dtype = zpad.dtype
    gb = gb_ref[0].astype(jnp.float32)
    _fill_borders(zpad, h, w)

    def _g_chunk(ci, _):
        # Dg pass: xpad interior <- relu(Dg * z + gb)
        r0 = ci * bh
        pat = _patches(zpad, r0, bh, w)                       # (bh*w, 18c)
        acc = jax.lax.dot_general(
            pat, gw_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + gb
        xpad[pl.dslice(1 + r0, bh), XOFF:XOFF + w, :] = (
            jnp.maximum(acc, 0.0).reshape(bh, w, c).astype(dtype))
        return 0

    jax.lax.fori_loop(0, h // bh, _g_chunk, 0)
    cp = pltpu.make_async_copy(
        xpad.at[1:h + 1, XOFF:XOFF + w, :], rec_hbm.at[b], sem)
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("depth", "interpret"))
def _fused_pallas(x1, z, dw, db, pw, pb, lam, depth: int, interpret: bool):
    """dw: (9*2C, C) im2col-major; pw: (9*C, 2C); biases (1, .); lam (1, 2C)."""
    B, H, W, C = x1.shape
    bh = _pick_bh(H, W, C)
    cp128 = _round_up(C, 128)
    x1 = jnp.pad(x1, ((0, 0), (0, 0), (0, 0), (0, cp128 - C)))
    kern = functools.partial(_kernel, depth=depth, h=H, w=W, c=C, bh=bh)
    # ANY blocks must be the full array with a trivial index map; the kernel
    # selects its batch element via program_id.
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            any_spec,
            any_spec,
            vmem(dw.shape), vmem(db.shape),
            vmem(pw.shape), vmem(pb.shape), vmem(lam.shape),
        ],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
        input_output_aliases={1: 0},   # z is consumed: out reuses its buffer
        scratch_shapes=[
            pltpu.VMEM((H, W, cp128), x1.dtype),
            pltpu.VMEM((H + 2, W + XOFF + 1, 2 * C), z.dtype),
            pltpu.VMEM((H + 2, W + XOFF + 1, C), x1.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x1, z, dw, db, pw, pb, lam)


@functools.partial(jax.jit, static_argnames=("depth", "interpret"))
def _fused_pallas_dg(x1, z, dw, db, pw, pb, lam, gw, gb, depth: int,
                     interpret: bool):
    """v3 = v2 + Dg tail. gw: (9*2C, C) im2col-major; gb (1, C).
    Returns (z_final, rec) with rec = relu(conv3x3_reflect(z_final, Dg))."""
    B, H, W, C = x1.shape
    bh = _pick_bh(H, W, C, with_dg=True)
    cp128 = _round_up(C, 128)
    x1 = jnp.pad(x1, ((0, 0), (0, 0), (0, 0), (0, cp128 - C)))
    kern = functools.partial(_kernel_dg, depth=depth, h=H, w=W, c=C, bh=bh)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            any_spec,
            any_spec,
            vmem(dw.shape), vmem(db.shape),
            vmem(pw.shape), vmem(pb.shape), vmem(lam.shape),
            vmem(gw.shape), vmem(gb.shape),
        ],
        out_specs=(any_spec, any_spec),
        out_shape=(jax.ShapeDtypeStruct(z.shape, z.dtype),
                   jax.ShapeDtypeStruct((B, H, W, C), x1.dtype)),
        input_output_aliases={1: 0},   # z is consumed: out reuses its buffer
        scratch_shapes=[
            pltpu.VMEM((H, W, cp128), x1.dtype),
            pltpu.VMEM((H + 2, W + XOFF + 1, 2 * C), z.dtype),
            pltpu.VMEM((H + 2, W + XOFF + 1, C), x1.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x1, z, dw, db, pw, pb, lam, gw, gb)


def _prep_weights(params, dtype):
    dw = params["D"]["w"].astype(dtype).reshape(-1, params["D"]["w"].shape[3])
    pw = params["P"]["w"].astype(dtype).reshape(-1, params["P"]["w"].shape[3])
    return (dw, params["D"]["b"].reshape(1, -1),
            pw, params["P"]["b"].reshape(1, -1),
            params["Lambda"].reshape(1, -1))


def _xla_loop(params, x1, z, depth):
    for _ in range(depth):
        z = L.ista_iteration(params, x1, z)
    return z


def _run(params, x1, z, depth):
    dw, db, pw, pb, lam = _prep_weights(params, x1.dtype)
    interpret = jax.default_backend() != "tpu"
    return _fused_pallas(x1, z, dw, db, pw, pb, lam, depth, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_vjp(params, x1, z, depth):
    return _run(params, x1, z, depth)


def _fwd(params, x1, z, depth):
    # XLA forward under autodiff: training graphs carry no Pallas ops (the
    # axon remote-compile helper rejects them in large BPTT graphs).
    return _xla_loop(params, x1, z, depth), (params, x1, z)


def _bwd(depth, res, g):
    params, x1, z = res
    _, vjp = jax.vjp(lambda p, a, b: _xla_loop(p, a, b, depth), params, x1, z)
    return vjp(g)


_fused_vjp.defvjp(_fwd, _bwd)


def fused_ista_v2(params, x1, z, depth: int = 5):
    """Drop-in for the XLA ISTA loop in cista_lstc.apply. Check ``supported``
    (or rely on the automatic fallback) — oversized frames run the XLA loop."""
    if not supported(x1.shape, z.shape):
        return _xla_loop(params, x1, z, depth)
    return _fused_vjp(params, x1, z, depth)


# ----------------------------- v3: ISTA + Dg ---------------------------------

def _xla_loop_dg(params, dg, x1, z, depth):
    z = _xla_loop(params, x1, z, depth)
    return z, L.conv_layer(dg, z, padding=1, activation="relu")


def _run_dg(params, dg, x1, z, depth):
    dw, db, pw, pb, lam = _prep_weights(params, x1.dtype)
    gw = dg["w"].astype(x1.dtype).reshape(-1, dg["w"].shape[3])
    gb = dg["b"].reshape(1, -1)
    interpret = jax.default_backend() != "tpu"
    return _fused_pallas_dg(x1, z, dw, db, pw, pb, lam, gw, gb, depth,
                            interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_dg_vjp(params, dg, x1, z, depth):
    return _run_dg(params, dg, x1, z, depth)


def _fwd_dg(params, dg, x1, z, depth):
    # XLA forward under autodiff (same policy as v2)
    return _xla_loop_dg(params, dg, x1, z, depth), (params, dg, x1, z)


def _bwd_dg(depth, res, g):
    params, dg, x1, z = res
    _, vjp = jax.vjp(
        lambda p, d, a, b: _xla_loop_dg(p, d, a, b, depth), params, dg, x1, z)
    return vjp(g)


_fused_dg_vjp.defvjp(_fwd_dg, _bwd_dg)


def fused_ista_dg(params, dg, x1, z, depth: int = 5):
    """ISTA loop + Dg conv (relu) in one kernel launch: returns
    (sparse_code, rec). Falls back to the XLA chain when unsupported —
    identical math either way (tests/test_pallas_ista.py)."""
    if not supported(x1.shape, z.shape, with_dg=True):
        return _xla_loop_dg(params, dg, x1, z, depth)
    return _fused_dg_vjp(params, dg, x1, z, depth)
