"""Banded lookup == gather-reference lookup, incl. far-out-of-range coords."""
import numpy as np

import jax.numpy as jnp

from cista_flow_tpu.ops import corr as CORR
from cista_flow_tpu.ops.corr_banded import lookup_corr_banded

RNG = np.random.default_rng(3)


def test_banded_matches_gather_reference():
    B = 2
    f1 = jnp.asarray(RNG.standard_normal((B, 24, 32, 64)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, 24, 32, 64)), jnp.float32)
    pyr = CORR.build_corr_pyramid(f1, f2)
    base = CORR.coords_grid(B, 24, 32)
    for scale in (2.0, 50.0, 1000.0):
        coords = base + jnp.asarray(
            RNG.standard_normal((B, 24, 32, 2)).astype(np.float32) * scale)
        ref = CORR.lookup_corr_gather(pyr, coords)
        got = lookup_corr_banded(pyr, coords)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
