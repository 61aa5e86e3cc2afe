"""Pallas TPU kernel for the RAFT correlation-pyramid window lookup.

ref: DCEIFlow/core/corr/raft_corr.py:32-54 (the hot kernel this replaces).

Why a kernel: the lookup samples a (2r+1)^2 bilinear window per pixel per
pyramid level. The round-1 MXU formulation (ops/corr.py:lookup_corr) turns
it into per-sample (9,h_l)@(h_l,w_l) selection GEMMs — exact, 36x over
naive gathers, but still MXU-padding-bound at ~19 ms/step of tiny batched
matmuls at flagship shapes (PERF.md), plus ~50 MB/iteration of selection-
matrix HBM traffic.

Design: a *radix shift decomposition* on the VPU. All 81 window taps of a
sample share one fractional offset (fy, fx), so the window factorizes into
an x-band selection, a y-band selection, and a single 2-tap lerp per axis.
The per-sample integer band offset u0 is decomposed by radix
(u0 = 8q + s on the x axis, u0 = 16q + 4a + b on the y axis) and each digit
is applied as a masked sum of STATICALLY sliced bands with the sample axis
n on the VPU lane dimension:

    band17[...] = sum_q [q == u0>>3] * slab[8q : 8q+17]      (coarse)
    band10[...] = sum_s [s == u0&7 ] * band17[s : s+10]      (fine)
    out9        = band10[0:9] + frac * (band10[1:10] - band10[0:9])

No gathers, no tiny GEMMs — dense per-lane FMAs over a logarithmic number
of statically-sliced terms. The slab is stored x-major (w, h, n) so the
larger selection axis rides the free outer dimension; the y stage's coarse
digit is radix-16 so its slices stay sublane-tile aligned.

Out-of-range taps keep the reference's zeros-padding grid_sample semantics
exactly: the slab is zero-padded and lookup coords are clamped to
[-(r+1), size+r], beyond which every tap weight provably multiplies a zero
(see _clamp).

All four pyramid levels run in ONE pallas_call per GRU iteration.
Accumulation follows the slab dtype — in bf16 serving this matches the
einsum path's own intermediate rounding (it casts its selection matrices
and row products to bf16 too).

Differentiation: serving-only (inference path). Training keeps the
autodiff-friendly einsum lookup (ops/corr.py); parity between the two is
pinned by tests/test_pallas_corr.py.
"""
from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .corr import CorrPyramid

_WIN = 9          # 2r+1 for r=4 (the only radius the models use)
_R = 4


def _qx(wl: int) -> int:
    return ((wl + 2 * _R + 2) >> 4) + 1     # x coarse digits (radix 16)


def _qy(hl: int) -> int:
    return ((hl + 2 * _R + 2) >> 4) + 1     # y coarse digits (radix 16)


def _wp(wl: int) -> int:
    return 16 * (_qx(wl) - 1) + 16 + _WIN   # padded x extent


def _hp(hl: int) -> int:
    return 16 * (_qy(hl) - 1) + 16 + _WIN + 1   # padded y extent


class PaddedPyramidT(NamedTuple):
    """Transposed, zero-padded pyramid for the Pallas lookup.

    levels_t[i]: (wp, hp, n_pad) — x-major slab, sample axis last (lanes),
    both spatial axes zero-padded by 2r+1 low and to the radix extent high.
    sizes[i]: the true (h_l, w_l).
    """
    levels_t: tuple
    sizes: tuple
    batch: int
    h1: int
    w1: int
    n: int


def _block(n: int) -> int:
    return 256 if n % 256 == 0 else 128


def supported(h1: int, w1: int, num_levels: int = 4) -> bool:
    """Whether the kernel can serve this resolution: every pyramid level
    must be non-empty (tiny test images bottom out at floor-halved 0-sized
    levels, which the einsum lookup handles benignly but a 0-extent Pallas
    block cannot)."""
    for _ in range(num_levels - 1):
        h1, w1 = h1 // 2, w1 // 2
    return h1 >= 1 and w1 >= 1


# HBM-resident zero-padded slabs: skips the kernel's per-grid-step interior
# copy into padded VMEM scratch (sublane-misaligned writes) at the cost of
# reading the zero borders from HBM (~3.9x slab traffic). Measured toggle.
_HBM_PAD = _os.environ.get("CISTA_CORR_HBM_PAD", "0") == "1"


def pad_pyramid_t(pyr: CorrPyramid, radius: int = 4) -> PaddedPyramidT:
    """One-time (per flow-net call) layout transform of the volume pyramid.

    Default: slabs stay TRUE-size in HBM — the radix zero-padding (up to
    ~50x data inflation on the small levels) is materialized in VMEM scratch
    inside the kernel, so HBM traffic per lookup is the real pyramid only.
    With CISTA_CORR_HBM_PAD=1 the padded slabs are materialized in HBM once
    per flow call instead."""
    assert radius == _R, "kernel is specialized for the models' radius 4"
    n = pyr.batch * pyr.h1 * pyr.w1
    bn = _block(max(n, 128))
    n_pad = -(-n // bn) * bn
    pad = 2 * _R + 1
    levels_t, sizes = [], []
    for level in pyr.levels:
        _, hl, wl, _ = level.shape
        x = jnp.transpose(level[..., 0], (2, 1, 0))       # (wl, hl, n)
        if _HBM_PAD:
            x = jnp.pad(x, ((pad, _wp(wl) - wl - pad),
                            (pad, _hp(hl) - hl - pad), (0, n_pad - n)))
        else:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n)))
        levels_t.append(x)
        sizes.append((hl, wl))
    return PaddedPyramidT(tuple(levels_t), tuple(sizes),
                          pyr.batch, pyr.h1, pyr.w1, n)


def _clamp(c: jnp.ndarray, size: int):
    """Clamped band offset + fraction. Exact under zeros padding: beyond
    either clamp bound every window tap indexes outside [0, size-1]
    (weight * 0), and at the bound the single in-range tap carries weight
    exactly 0."""
    c = jnp.clip(c.astype(jnp.float32), -(_R + 1.0), size + float(_R))
    lo = jnp.floor(c)
    frac = c - lo
    u0 = (lo.astype(jnp.int32) - _R) + (2 * _R + 1)       # ∈ [0, size+2r+2]
    return u0, frac


def _onehot(digit: jnp.ndarray, num: int) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (num, digit.shape[0]), 0)
    return (i == digit[None, :]).astype(jnp.float32)


def _lerp_mask(digit: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    """5-row fused fine-select + 2-tap-lerp mask: row j carries
    (1-f)*[j==d] + f*[j==d+1] so the kernel's last digit stage IS the
    bilinear lerp (one masked sum instead of onehot select + lerp pass)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (5, digit.shape[0]), 0)
    d = digit[None, :]
    return ((i == d).astype(jnp.float32) * (1.0 - frac)[None, :]
            + (i == d + 1).astype(jnp.float32) * frac[None, :])


def _level_masks(cflat: jnp.ndarray, hl: int, wl: int, scale: float,
                 dtype) -> jnp.ndarray:
    """Stacked per-sample selection masks, (Qx+4+5+Qy+4+5, n_pad).

    Row layout: [x coarse onehot | x mid onehot | x fine-lerp |
    y coarse onehot | y mid onehot | y fine-lerp]."""
    ux0, fx = _clamp(cflat[:, 0] * scale, wl)
    uy0, fy = _clamp(cflat[:, 1] * scale, hl)
    rows = [
        _onehot(ux0 >> 4, _qx(wl)),
        _onehot((ux0 >> 2) & 3, 4),
        _lerp_mask(ux0 & 3, fx),
        _onehot(uy0 >> 4, _qy(hl)),
        _onehot((uy0 >> 2) & 3, 4),
        _lerp_mask(uy0 & 3, fy),
    ]
    return jnp.concatenate(rows, axis=0).astype(dtype)


def _make_kernel(sizes, hbm_pad: bool, proj: bool):
    nlv = len(sizes)

    def kernel(*refs):
        slabs = refs[:nlv]
        masks = refs[nlv:2 * nlv]
        idx = 2 * nlv
        if proj:
            w_ref, b_ref = refs[idx], refs[idx + 1]
            idx += 2
        out_ref = refs[idx]
        scratch = refs[idx + 1:]
        if proj:
            winbuf, scratch = scratch[-1], scratch[:-1]
        else:
            winbuf = out_ref
        pad = 2 * _R + 1
        ns = 3 - (1 if hbm_pad else 0)

        # Zero the padded-slab scratches ONCE; later grid steps only rewrite
        # the interior, so the zero border persists across steps.
        if not hbm_pad:
            @pl.when(pl.program_id(0) == 0)
            def _():
                for i in range(nlv):
                    ps = scratch[3 * i]
                    ps[...] = jnp.zeros_like(ps)

        for i, (hl, wl) in enumerate(sizes):
            qx, qy = _qx(wl), _qy(hl)
            m = masks[i]
            if hbm_pad:
                ps = slabs[i]                 # already zero-padded in HBM
                bx, bxy = scratch[ns * i:ns * i + 2]
            else:
                ps, bx, bxy = scratch[3 * i:3 * i + 3]
                ps[pad:pad + wl, pad:pad + hl, :] = slabs[i][...]

            def msum(terms):
                acc = terms[0]
                for t in terms[1:]:
                    acc = acc + t
                return acc

            # stage order narrows the LARGE axes first: x-coarse (full slab
            # read) -> y-coarse (full-x band) -> 4x4 fine digits on narrow
            # (<=25, <=26) bands -> one 2-tap lerp per axis.
            # --- x coarse (radix 16): (25, hp, BN) -------------------------
            o = qx + 9
            if qx == 1:
                bx = ps                                   # alias, no copy
            else:
                bx[...] = msum([m[q][None, None, :] * ps[16 * q:16 * q + 25]
                                for q in range(qx)])
            # --- y coarse (radix 16, tile-aligned): (25, 26, BN) -----------
            if qy == 1:
                bxy = bx                                  # alias, no copy
            else:
                bxy[...] = msum(
                    [m[o + q][None, None, :] * bx[:, 16 * q:16 * q + 26, :]
                     for q in range(qy)])
            # --- x mid (4): (13, 26); x fine-lerp (5): (9, 26) ------------
            # the fine digit's masked sum IS the x lerp (_lerp_mask), and
            # its slices ride the untiled outer axis (free).
            b3 = msum([m[qx + a][None, None, :]
                       * bxy[4 * a:4 * a + 13, 0:26, :]
                       for a in range(4)])
            b4 = msum([m[qx + 4 + j][None, None, :] * b3[j:j + 9]
                       for j in range(5)])
            # --- y mid (4): (9, 13); y fine-lerp (5): (9, 9) --------------
            o += qy
            b5 = msum([m[o + a][None, None, :] * b4[:, 4 * a:4 * a + 13, :]
                       for a in range(4)])
            win = msum([m[o + 4 + j][None, None, :] * b5[:, j:j + 9, :]
                        for j in range(5)])             # (9b, 9a, BN)
            # channel order: x-offset-major (torch meshgrid(dy,dx) quirk —
            # see ops/corr.py lookup_corr): out[b*9 + a] = win[b, a].
            # Packed (324, bn) layout: an aligned (nlv*9, 9, bn) variant was
            # measured — the kernel body is unchanged (the 9-strided writes
            # are not the bottleneck) and its downstream merge-reshape costs
            # +0.45 ms/launch, so packed stays.
            base = i * _WIN * _WIN
            for b in range(_WIN):
                winbuf[base + b * _WIN:base + (b + 1) * _WIN, :] = win[b]

        if proj:
            # Fused motion-encoder convc1: one K=324 MXU contraction over the
            # assembled window rows + bias + ReLU. The kernel body is
            # VPU-bound (radix band selection), so the MXU work rides along
            # nearly free and the (324, n) cost features never hit HBM.
            # Orientation (bn, cout): the consumer (convc2) is sample-major,
            # so this kills the downstream (324, n) -> (n, 324) transpose too.
            acc = jax.lax.dot_general(
                winbuf[...], w_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[...] = jnp.maximum(acc + b_ref[...], 0.0).astype(
                out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("sizes", "interpret"))
def _lookup_all_levels(slabs, masks, sizes, interpret: bool,
                       wproj=None, bproj=None):
    nlv = len(slabs)
    n_pad = slabs[0].shape[-1]
    bn = _block(n_pad)
    dt = slabs[0].dtype
    proj = wproj is not None

    def spec3(shape):
        return pl.BlockSpec((shape[0], shape[1], bn), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def spec2(shape):
        return pl.BlockSpec((shape[0], bn), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def spec_full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    scratch = []
    for (hl, wl) in sizes:
        hp = _hp(hl)
        if not _HBM_PAD:
            scratch.append(pltpu.VMEM((_wp(wl), hp, bn), dt))  # padded slab
        scratch += [
            pltpu.VMEM((25, hp, bn), dt),        # x-coarse band
            pltpu.VMEM((25, 26, bn), dt),        # xy-coarse band
        ]

    extra_in, extra_specs = [], []
    if proj:
        extra_in = [wproj, bproj]
        extra_specs = [spec_full(wproj.shape), spec_full(bproj.shape)]
        scratch.append(pltpu.VMEM((nlv * _WIN * _WIN, bn), dt))  # winbuf
        cout = wproj.shape[1]
        out_specs = pl.BlockSpec((bn, cout), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, cout), dt)
    else:
        n_out = nlv * _WIN * _WIN
        out_specs = pl.BlockSpec((n_out, bn), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_out, n_pad), dt)

    return pl.pallas_call(
        _make_kernel(sizes, _HBM_PAD, proj),
        grid=(n_pad // bn,),
        in_specs=([spec3(s.shape) for s in slabs]
                  + [spec2(m.shape) for m in masks] + extra_specs),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*slabs, *masks, *extra_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lookup_trainable(shape_meta, levels, coords):
    from .corr import CorrPyramid as _CP
    pyr = _CP(levels, *shape_meta)
    return lookup_corr_pallas(pad_pyramid_t(pyr), coords)


def _lookup_trainable_fwd(shape_meta, levels, coords):
    return _lookup_trainable(shape_meta, levels, coords), (levels, coords)


def _lookup_trainable_bwd(shape_meta, res, g):
    # The lookup is linear in the pyramid, and both formulations compute the
    # SAME function, so the einsum path's vjp is the exact adjoint (the
    # transposed selection matmuls). coords' cotangent is exact too (the
    # models stop_gradient coords before the lookup, but correctness here
    # does not rely on that).
    from . import corr as CORR
    levels, coords = res
    _, vjp = jax.vjp(
        lambda lv, c: CORR.lookup_corr(CORR.CorrPyramid(lv, *shape_meta), c),
        levels, coords)
    return vjp(g)


_lookup_trainable.defvjp(_lookup_trainable_fwd, _lookup_trainable_bwd)


def lookup_corr_trainable(pyr, coords: jnp.ndarray,
                          radius: int = 4) -> jnp.ndarray:
    """Differentiable drop-in for ops.corr.lookup_corr: Pallas radix kernel
    forward, einsum-adjoint backward (custom_vjp). Used by the training path
    on TPU — the kernel has no native autodiff, but its adjoint is just the
    transpose of the selection contraction the einsum path already builds."""
    assert radius == _R
    return _lookup_trainable((pyr.batch, pyr.h1, pyr.w1), pyr.levels, coords)


def lookup_corr_pallas(pyr_t: PaddedPyramidT, coords: jnp.ndarray,
                       radius: int = 4, proj: dict | None = None) -> jnp.ndarray:
    """Drop-in twin of ops.corr.lookup_corr over the padded-transposed
    pyramid. coords: (B, H1, W1, 2) level-0 pixel coords.
    Returns (B, H1, W1, num_levels*(2r+1)^2), level-major.

    proj: optional conv params of the motion encoder's 1x1 corr projection
    (ref: with_event_updater.py:72 convc1 / ERAFT update.py:65) — when
    given, the kernel fuses relu(convc1(lookup)) via an in-kernel MXU
    contraction and returns (B, H1, W1, cout) instead (serving path)."""
    assert radius == _R
    B, H1, W1, _ = coords.shape
    n = B * H1 * W1
    n_pad = pyr_t.levels_t[0].shape[-1]
    interpret = jax.default_backend() != "tpu"
    dt = pyr_t.levels_t[0].dtype

    cflat = coords.reshape(n, 2)
    cflat = jnp.pad(cflat, ((0, n_pad - n), (0, 0)))
    masks = tuple(
        _level_masks(cflat, hl, wl, 1.0 / (2.0 ** i), dt)
        for i, (hl, wl) in enumerate(pyr_t.sizes))
    wproj = bproj = None
    if proj is not None:
        cin = proj["w"].shape[2]
        wproj = proj["w"].reshape(cin, -1).astype(dt)
        bproj = proj["b"].reshape(1, -1).astype(jnp.float32)
    out = _lookup_all_levels(tuple(pyr_t.levels_t), masks, pyr_t.sizes,
                             interpret, wproj, bproj)
    if proj is not None:
        # sample-major (n, cout) straight from the kernel — no transpose
        return out[:n].reshape(B, H1, W1, -1)
    return (jnp.transpose(out[:, :n]).reshape(B, H1, W1, -1)
            .astype(coords.dtype))


# Kernel-path selection (serving lookup / training custom_vjp lookup /
# fused corr projection) is configuration, not ambient module state: the
# models read cfg.{serve_pallas, train_pallas, corr_fuse_proj}
# (configs.Config; the CISTA_* env vars are honored there as default
# overrides only). train_pallas stays default-OFF in this environment —
# the axon tunnel's remote-compile helper crashes (HTTP 500) on the
# flagship BPTT train graph once the kernel is embedded (PERF.md
# "Training"); the kernel + custom_vjp match jax.grad exactly
# (tests/test_pallas_corr.py).
