"""Pallas TPU kernel building the 4-corner augmented image for C>1 warps.

The C>1 bilinear warp (ops/warp.py, ref: utils/flow_utils.py:40-190) fetches
all 4 bilinear corners of each output pixel in ONE row-gather by augmenting
the channel dim. In flat (B*H*W, C) layout the corners of linear site ``n``
are rows ``n``, ``n+1``, ``n+W``, ``n+W+1`` (mis-fetched edge slots always
carry bilinear weight exactly 0), so the augmented tensor is four
row-offset windows of the same buffer:

    aug[n] = [flat[n] | flat[n+1] | flat[n+W] | flat[n+W+1]]

XLA materializes that concat at ~12 GB/s (sublane-misaligned copies,
measured 1.8 ms at flagship shapes); this kernel streams it at bandwidth
(~0.2 ms) with static in-VMEM slices: each grid block reads its (bm, C)
window plus the first rows of the next block and writes the (bm, 4C) output
with four statically-sliced lane-offset stores.

Serving-path only (the warp itself is not differentiated through in the
eval CLIs); the training/autodiff path keeps the XLA concat.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 4096          # rows per grid block
_TAIL = 256         # rows borrowed from the next block (must be >= W+1)


def _offsets(w: int) -> tuple:
    return (0, 1, w, w + 1)


def _kernel(w: int, body_ref, tail_ref, out_ref):
    bm = body_ref.shape[0]
    c = body_ref.shape[1]
    for k, off in enumerate((0, 1, w, w + 1)):
        lo = c * k
        if off == 0:
            out_ref[:, lo:lo + c] = body_ref[:, :]
        else:
            out_ref[: bm - off, lo:lo + c] = body_ref[off:, :]
            out_ref[bm - off:, lo:lo + c] = tail_ref[:off, :]


def supported(w: int, c: int) -> bool:
    return w + 1 <= _TAIL and c % 128 == 0


def _build_aug_pallas(flat: jnp.ndarray, w: int) -> jnp.ndarray:
    n, c = flat.shape
    n_pad = pl.cdiv(n, _BM) * _BM
    # pad so every block's tail window exists (zeros are weight-0 slots)
    flatp = jnp.zeros((n_pad + _TAIL, c), flat.dtype).at[:n].set(flat)

    nblk = n_pad // _BM
    return pl.pallas_call(
        functools.partial(_kernel, w),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_BM, c), lambda i: (i, 0)),
            # first _TAIL rows of the next block (clamped read is safe:
            # flatp has _TAIL rows of zero padding past the last block)
            pl.BlockSpec((_TAIL, c), lambda i: (i * (_BM // _TAIL) + _BM // _TAIL, 0)),
        ],
        out_specs=pl.BlockSpec((_BM, 4 * c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4 * c), flat.dtype),
    )(flatp, flatp)


def build_aug_xla(flat: jnp.ndarray, w: int) -> jnp.ndarray:
    """XLA fallback: the same four offset windows via one slice-concat."""
    n, c = flat.shape
    flatp = jnp.concatenate(
        [flat, jnp.zeros((w + 1, c), flat.dtype)], axis=0)
    return jnp.concatenate(
        [flatp[off:n + off] for off in _offsets(w)], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def build_aug(flat: jnp.ndarray, w: int) -> jnp.ndarray:
    """flat: (N, C) row-major image stack; returns (N', 4C), N' >= N, with
    the four corner windows at lane offsets 0/C/2C/3C. Rows past N read
    zeros (their bilinear weight is 0 by construction); rows past N in the
    OUTPUT are padding the caller's gather never indexes.

    Linear in ``flat`` — the custom VJP keeps the Pallas forward usable
    under autodiff (adjoint = sum of the four shifted cotangent windows).
    """
    n, c = flat.shape
    if (jax.default_backend() == "tpu" and supported(w, c)
            and flat.dtype == jnp.bfloat16):
        return _build_aug_pallas(flat, w)
    return build_aug_xla(flat, w)


def _build_aug_fwd(flat, w):
    return build_aug(flat, w), flat.shape


def _build_aug_bwd(w, shape, ct):
    n, c = shape
    ctp = jnp.pad(ct, ((_TAIL, _TAIL), (0, 0)))
    g = sum(ctp[_TAIL - off:_TAIL - off + n, k * c:(k + 1) * c]
            for k, off in enumerate(_offsets(w)))
    return (g.astype(ct.dtype),)


build_aug.defvjp(_build_aug_fwd, _build_aug_bwd)
