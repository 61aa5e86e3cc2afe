"""Pallas TPU kernel: fused InstanceNorm2d (+ optional relu).

The flow-net encoders (nn/encoders.py; ref: DCEIFlow/core/backbone/
raft_encoder.py:125-279) run ~30 parameter-free instance norms per step.
As XLA fusions the stats pass materializes the squared operand and reads
the conv output twice, and the normalize(+relu) apply is a third full
pass — measured ~5.8 ms/step at flagship shapes where the HBM floor is
~0.6 ms. This kernel keeps each sample's (H*W, C) slab VMEM-resident:
one read, stats as f32-accumulated MXU ones-dots, normalize + relu in
registers, one write.

Numerics match ops/conv.py's bf16 ``_NORM_DOT`` path (bf16 x*x operand,
f32 accumulation, one-pass variance, bf16 mean/inv broadcast). The
custom VJP recomputes stats in f32 and applies the standard instance-norm
adjoint, so the kernel stays usable under autodiff (mixed-precision
training differentiates through the flow-net norms).

VERDICT (chip-measured, default OFF — CISTA_PALLAS_NORM=1 to opt in):
e2e NEGATIVE, 507 vs 588 fps flagship. The kernel itself is exact and
fast, but the pallas_call boundary forces relayout copies on the
surrounding convs ([32,96,128,64] conv-adjacent time 2.9 -> 10.7 ms) and
unfuses the residual adds — the same failure mode as ops/pallas_conv.py.
A self-Gram s2 (diag of dot(x,x), no squared-operand materialization)
was also measured: 529 fps — 32 batched 64x64 GEMMs are latency-bound.
The shipped stats stay the ones-dot formulation in ops/conv.py.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ENABLED = _os.environ.get("CISTA_PALLAS_NORM", "0") == "1"
_VMEM_CAP = 4 * 1024 * 1024  # per-sample slab budget (bytes)


def _chunk(hw: int) -> int:
    """Largest divisor of hw that is <= 2048 and a multiple of 16 (keeps
    per-chunk temporaries small so the slab fits scoped VMEM)."""
    if hw <= 2048:
        return hw
    for ck in range(2048, 15, -16):
        if hw % ck == 0:
            return ck
    return 0


def supported(x: jnp.ndarray) -> bool:
    if x.ndim != 4 or x.dtype != jnp.bfloat16 or not _ENABLED:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    hw = h * w
    return hw % 16 == 0 and hw * c * 2 <= _VMEM_CAP and _chunk(hw) > 0


def _kernel(n: float, eps: float, relu: bool, ck: int, x_ref, o_ref):
    hw, c = x_ref.shape[1], x_ref.shape[2]
    dn = (((1,), (0,)), ((), ()))
    dt = x_ref.dtype
    s1 = jnp.zeros((1, c), jnp.float32)
    s2 = jnp.zeros((1, c), jnp.float32)
    ones = jnp.ones((1, ck), dt)
    for i in range(hw // ck):
        xc = x_ref[0, i * ck:(i + 1) * ck, :]
        s1 += jax.lax.dot_general(ones, xc, dn,
                                  preferred_element_type=jnp.float32)
        s2 += jax.lax.dot_general(ones, xc * xc, dn,
                                  preferred_element_type=jnp.float32)
    mean = s1 / n                                   # (1, C) f32
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mb = mean.astype(dt)
    ib = inv.astype(dt)
    for i in range(hw // ck):
        y = (x_ref[0, i * ck:(i + 1) * ck, :] - mb) * ib
        if relu:
            y = jnp.maximum(y, jnp.zeros((), dt))
        o_ref[0, i * ck:(i + 1) * ck, :] = y


def _instance_norm_pallas(x: jnp.ndarray, eps: float, relu: bool,
                          interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(_kernel, float(hw), eps, relu, _chunk(hw)),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(xr)
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm_fused(x: jnp.ndarray, eps: float = 1e-5,
                        relu: bool = False,
                        interpret: bool = False) -> jnp.ndarray:
    """relu(instance_norm(x)) in one HBM round trip. Caller guarantees
    ``supported(x)``; see ops/conv.py:instance_norm for the dispatcher."""
    return _instance_norm_pallas(x, eps, relu, interpret)


def _fwd(x, eps, relu, interpret):
    return instance_norm_fused(x, eps, relu, interpret), x


def _bwd(eps, relu, interpret, x, ct):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    g = ct.astype(jnp.float32)
    if relu:
        g = jnp.where(xhat > 0, g, 0.0)
    gm = jnp.mean(g, axis=(1, 2), keepdims=True)
    gxm = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    dx = inv * (g - gm - xhat * gxm)
    return (dx.astype(x.dtype),)


instance_norm_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Stats-only kernel: one HBM pass over x producing just (mean, inv_std) as
# tiny f32 (B, C) outputs. Unlike instance_norm_fused above, the big tensor
# is never a kernel OUTPUT, so the normalize+relu apply stays an XLA fusion
# that rides into the consumer conv — sidestepping the relayout failure mode
# that made the full kernel e2e-negative. The XLA ones-dot stats it replaces
# are two (1,hw)x(hw,C) vector-matrix contractions (M=1 starves the MXU's
# row dimension; measured 0.24 ms/site at (8,96,128,64) where the HBM floor
# is ~0.03 ms).
#
# VERDICT (chip-measured, default OFF — CISTA_STATS_KERNEL=1 to opt in):
# e2e NEGATIVE even in this operand-only form, 619 vs 633 fps flagship.
# The custom-call boundary still forces an operand staging copy per site,
# and the XLA stats "cost" it replaces is a fusion that also carries
# neighboring elementwise work, so removing the dots does not recover
# their attributed time. Third strike for Pallas at the norm sites; the
# ones-dot formulation in ops/conv.py stays.
# ---------------------------------------------------------------------------

_STATS_ENABLED = _os.environ.get("CISTA_STATS_KERNEL", "0") == "1"


def stats_supported(x) -> bool:
    if x.ndim != 4 or x.dtype != jnp.bfloat16 or not _STATS_ENABLED:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    hw = h * w
    return c % 64 == 0 and hw % 8 == 0 and _chunk(hw) > 0


def _stats_kernel(n: float, eps: float, ck: int, x_ref, mean_ref, inv_ref):
    hw, c = x_ref.shape[1], x_ref.shape[2]
    dn = (((1,), (0,)), ((), ()))
    dt = x_ref.dtype
    s1 = jnp.zeros((1, c), jnp.float32)
    s2 = jnp.zeros((1, c), jnp.float32)
    ones = jnp.ones((1, ck), dt)
    for i in range(hw // ck):
        xc = x_ref[0, i * ck:(i + 1) * ck, :]
        s1 += jax.lax.dot_general(ones, xc, dn,
                                  preferred_element_type=jnp.float32)
        s2 += jax.lax.dot_general(ones, xc * xc, dn,
                                  preferred_element_type=jnp.float32)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    i = pl.program_id(0)
    mean_ref[i, :] = mean[0]
    inv_ref[i, :] = jax.lax.rsqrt(var + eps)[0]


def instance_norm_stats(x: jnp.ndarray, eps: float,
                        interpret: bool = False):
    """(mean, inv_std) per (sample, channel), f32 (B, C) each; numerics match
    the ones-dot path in ops/conv.py (bf16 x*x operand, f32 accumulation,
    one-pass clamped variance)."""
    b, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(b, hw, c)
    mean, inv = pl.pallas_call(
        functools.partial(_stats_kernel, float(hw), eps, _chunk(hw)),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((b, c), lambda i: (0, 0)),
                   pl.BlockSpec((b, c), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, c), jnp.float32)],
        interpret=interpret,
    )(xr)
    return mean, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm_statskernel(x: jnp.ndarray, eps: float = 1e-5,
                              relu: bool = False,
                              interpret: bool = False) -> jnp.ndarray:
    """instance_norm(x)(+relu) with the stats from the Pallas single-pass
    kernel and the apply left to XLA (fuses into the consumer). Caller
    guarantees ``stats_supported(x)``."""
    mean, inv = instance_norm_stats(x, eps, interpret)
    y = ((x - mean[:, None, None, :].astype(x.dtype))
         * inv[:, None, None, :].astype(x.dtype))
    return jnp.maximum(y, jnp.zeros((), x.dtype)) if relu else y


def _stats_fwd(x, eps, relu, interpret):
    return instance_norm_statskernel(x, eps, relu, interpret), x


instance_norm_statskernel.defvjp(_stats_fwd, _bwd)
