"""im2col Pallas 3x3 conv kernel vs the XLA conv (interpret mode on CPU).

The kernel is a measured opt-in (default off: standalone wins 1.4x @64ch
but net-negative in the full graph — see ops/pallas_conv.py). These tests
pin its exactness and its custom_vjp so the opt-in stays safe.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cista_flow_tpu.ops import pallas_conv

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)


def _xla(x, w, b, padding_mode, relu=False):
    return pallas_conv._xla_ref(x, w, b, padding_mode, relu)


@pytest.mark.parametrize("shape,cout", [((2, 16, 24, 32), 32),
                                        ((1, 24, 32, 64), 64),
                                        ((1, 8, 16, 128), 128)])
@pytest.mark.parametrize("padding_mode", ["zeros", "reflect"])
def test_conv3x3_matches_xla(shape, cout, padding_mode):
    rng = np.random.default_rng(0)
    cin = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    assert pallas_conv.supported(x.shape, w.shape)
    got = pallas_conv.conv3x3(x, w, b, padding_mode)
    ref = _xla(x, w, b, padding_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_relu_epilogue():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 32, 32)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    got = pallas_conv.conv3x3(x, w, b, "zeros", relu=True)
    ref = _xla(x, w, b, "zeros", relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_grad_is_xla_adjoint():
    """custom_vjp: gradient equals jax.grad of the plain XLA conv."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 32)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 32, 32)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)

    def loss_k(x, w, b):
        return jnp.sum(pallas_conv.conv3x3(x, w, b, "reflect") ** 2)

    def loss_r(x, w, b):
        return jnp.sum(_xla(x, w, b, "reflect") ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_supported_rejects_bad_shapes():
    # non-3x3 / channel mismatch / W not lane-tileable / VMEM blowup
    assert not pallas_conv.supported((1, 16, 16, 32), (5, 5, 32, 32))
    assert not pallas_conv.supported((1, 16, 16, 16), (3, 3, 16, 16))
    assert not pallas_conv.supported((1, 16, 17, 32), (3, 3, 32, 32))
    assert not pallas_conv.supported((1, 1024, 1024, 128), (3, 3, 128, 128))


def test_dispatch_default_off():
    """ops.conv must NOT route to the kernel unless CISTA_PALLAS_CONV=1
    (measured e2e-negative; ops/pallas_conv.py header)."""
    assert os.environ.get("CISTA_PALLAS_CONV", "0") != "1"
    assert not pallas_conv.ENABLED
