"""Fused Pallas ISTA kernel vs the unfused XLA loop (interpret mode on CPU)."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from cista_flow_tpu.nn import layers as L
from cista_flow_tpu.ops import pallas_ista

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)


def test_fused_ista_matches_loop():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 24, 32
    params = L.ista_block_init(jax.random.PRNGKey(0), base_channels=C)
    x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), jnp.float32)

    ref = z
    for _ in range(5):
        ref = L.ista_iteration(params, x1, ref)

    got = pallas_ista.fused_ista_pallas(
        x1, z, params["D"]["w"], params["D"]["b"],
        params["P"]["w"], params["P"]["b"], params["Lambda"],
        depth=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_ista_fallback_when_too_big():
    """Oversized working set silently falls back to the XLA loop."""
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 256, 256, 64  # > VMEM budget
    params = L.ista_block_init(jax.random.PRNGKey(1), base_channels=C)
    x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), jnp.float32)
    ref = z
    for _ in range(2):
        ref = L.ista_iteration(params, x1, ref)
    got = pallas_ista.fused_ista(params, x1, z, depth=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
