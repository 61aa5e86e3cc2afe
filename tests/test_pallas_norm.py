"""Fused Pallas instance-norm kernel (interpret mode on CPU).

The kernel is a measured opt-in (default off: exact and fast standalone,
but the pallas_call boundary unfuses the surrounding convs — see
ops/pallas_norm.py's VERDICT). These tests pin its exactness and its
custom VJP so the opt-in stays safe.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cista_flow_tpu.ops import pallas_norm

pytestmark = pytest.mark.slow  # full tier only: compile-heavy


def _ref(x, eps=1e-5, relu=False):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, (1, 2), keepdims=True)
    v = jnp.var(xf, (1, 2), keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + eps)
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("shape", [(2, 16, 24, 64), (1, 48, 64, 96),
                                   (3, 90, 120, 64)])
@pytest.mark.parametrize("relu", [False, True])
def test_kernel_matches_reference(shape, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.5, jnp.bfloat16)
    got = pallas_norm.instance_norm_fused(x, 1e-5, relu, True)
    ref = _ref(x, relu=relu)
    # bf16 normalize: absolute tolerance at the bf16 ulp of unit-scale data
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.05)


def test_custom_vjp_matches_reference_grad():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.bfloat16)

    def f_k(x):
        y = pallas_norm.instance_norm_fused(x, 1e-5, True, True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def f_r(x):
        return jnp.sum(jnp.sin(_ref(x, relu=True)))

    gk = np.asarray(jax.grad(f_k)(x), np.float32)
    gr = np.asarray(jax.grad(f_r)(x), np.float32)
    np.testing.assert_allclose(gk, gr, atol=0.05)


def test_chunking_covers_model_shapes():
    for hw in (96 * 128, 48 * 64, 24 * 32, 90 * 120):
        ck = pallas_norm._chunk(hw)
        assert ck > 0 and hw % ck == 0 and ck <= 2048


@pytest.mark.parametrize("relu", [False, True])
def test_stats_kernel_matches_reference(relu):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 24, 32, 64)) * 2 + 0.5,
                    jnp.bfloat16)
    got = pallas_norm.instance_norm_statskernel(x, 1e-5, relu, True)
    ref = _ref(x, relu=relu)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.05)


def test_stats_kernel_vjp_matches_reference_grad():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.bfloat16)

    def f_k(x):
        y = pallas_norm.instance_norm_statskernel(x, 1e-5, True, True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def f_r(x):
        return jnp.sum(jnp.sin(_ref(x, relu=True)))

    gk = np.asarray(jax.grad(f_k)(x), np.float32)
    gr = np.asarray(jax.grad(f_r)(x), np.float32)
    np.testing.assert_allclose(gk, gr, atol=0.05)
