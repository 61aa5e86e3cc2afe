"""Parity tests for the Pallas 4-corner aug builder (ops/pallas_aug.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cista_flow_tpu.ops import pallas_aug as PA


@pytest.mark.parametrize("n,c,w", [(2 * 90 * 120, 128, 120), (1000, 128, 30)])
def test_build_aug_matches_xla(n, c, w):
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    ref = PA.build_aug_xla(flat, w)
    got = PA.build_aug(flat, w)  # XLA branch off-TPU; kernel branch on-TPU
    np.testing.assert_array_equal(np.asarray(got[:n]), np.asarray(ref))


def test_build_aug_kernel_interpret():
    """The Pallas kernel itself (interpret mode, any backend)."""
    import functools

    from jax.experimental import pallas as pl

    n, c, w = 5000, 128, 120
    rng = np.random.default_rng(1)
    flat = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    n_pad = pl.cdiv(n, PA._BM) * PA._BM
    flatp = jnp.zeros((n_pad + PA._TAIL, c), flat.dtype).at[:n].set(flat)
    out = pl.pallas_call(
        functools.partial(PA._kernel, w),
        grid=(n_pad // PA._BM,),
        in_specs=[
            pl.BlockSpec((PA._BM, c), lambda i: (i, 0)),
            pl.BlockSpec((PA._TAIL, c),
                         lambda i: (i * (PA._BM // PA._TAIL) + PA._BM // PA._TAIL, 0)),
        ],
        out_specs=pl.BlockSpec((PA._BM, 4 * c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4 * c), flat.dtype),
        interpret=True,
    )(flatp, flatp)
    ref = PA.build_aug_xla(flat, w)
    np.testing.assert_array_equal(np.asarray(out[:n]), np.asarray(ref))


def test_build_aug_custom_vjp_matches_autodiff():
    n, c, w = 1000, 8, 30
    rng = np.random.default_rng(2)
    flat = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((n, 4 * c)), jnp.float32)
    g1 = jax.grad(lambda x: jnp.vdot(PA.build_aug(x, w)[:n], ct))(flat)
    g2 = jax.grad(lambda x: jnp.vdot(PA.build_aug_xla(x, w), ct))(flat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
