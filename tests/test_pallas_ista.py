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


class TestFusedIstaV2:
    """v2 (whole-frame VMEM residency + im2col GEMMs). Default-off e2e
    (boundary fusions, see module docstring); exactness pinned here in
    interpret mode."""

    def test_matches_loop_bf16(self):
        from cista_flow_tpu.ops import pallas_ista2 as PI
        rng = np.random.default_rng(2)
        B, H, W, C = 2, 16, 24, 32
        params = L.ista_block_init(jax.random.PRNGKey(2), base_channels=C)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)
        params["Lambda"] = params["Lambda"].astype(jnp.float32)
        x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        z = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), jnp.bfloat16)
        assert PI.supported(x1.shape, z.shape)

        ref = PI._xla_loop(params, x1, z, 3)
        dw, db, pw, pb, lam = PI._prep_weights(params, x1.dtype)
        got = PI._fused_pallas(x1, z, dw, db, pw, pb, lam, 3, True)
        # bf16 rounding: interpret mode accumulates f32 like the kernel, but
        # intermediate z quantization orders differ slightly from XLA's.
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0.05, atol=0.05)

    def test_fallback_when_unsupported(self):
        from cista_flow_tpu.ops import pallas_ista2 as PI
        rng = np.random.default_rng(3)
        B, H, W, C = 1, 16, 20, 16  # C<32 and W%8!=0 -> unsupported
        params = L.ista_block_init(jax.random.PRNGKey(3), base_channels=C)
        x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        z = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), jnp.float32)
        assert not PI.supported(x1.shape, z.shape)
        got = PI.fused_ista_v2(params, x1, z, depth=2)
        ref = PI._xla_loop(params, x1, z, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_matches_xla_loop(self):
        from cista_flow_tpu.ops import pallas_ista2 as PI
        rng = np.random.default_rng(4)
        B, H, W, C = 1, 8, 16, 32
        params = L.ista_block_init(jax.random.PRNGKey(4), base_channels=C)
        x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        z = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), jnp.float32)

        def f_kernel(p, a, b):
            return jnp.sum(PI._fused_vjp(p, a, b, 2) ** 2)

        def f_ref(p, a, b):
            return jnp.sum(PI._xla_loop(p, a, b, 2) ** 2)

        gk = jax.grad(f_kernel, argnums=(0, 1, 2))(params, x1, z)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(params, x1, z)
        for a, b in zip(jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestFusedIstaDg:
    """v3 (= v2 + the Dg conv/relu as an in-kernel tail pass)."""

    def test_matches_chain_bf16(self):
        from cista_flow_tpu.ops import pallas_ista2 as PI
        rng = np.random.default_rng(5)
        B, H, W, C = 2, 16, 24, 32
        params = L.ista_block_init(jax.random.PRNGKey(5), base_channels=C)
        dg = L.conv_layer_init(jax.random.PRNGKey(6), 2 * C, C)
        params, dg = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), (params, dg))
        params["Lambda"] = params["Lambda"].astype(jnp.float32)
        x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        z = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), jnp.bfloat16)
        assert PI.supported(x1.shape, z.shape)

        zr, recr = PI._xla_loop_dg(params, dg, x1, z, 3)
        zk, reck = PI._run_dg(params, dg, x1, z, 3)
        np.testing.assert_allclose(np.asarray(zk, np.float32),
                                   np.asarray(zr, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(reck, np.float32),
                                   np.asarray(recr, np.float32),
                                   rtol=0.05, atol=0.05)

    def test_grad_matches_xla_chain(self):
        from cista_flow_tpu.ops import pallas_ista2 as PI
        rng = np.random.default_rng(6)
        B, H, W, C = 1, 8, 16, 32
        params = L.ista_block_init(jax.random.PRNGKey(7), base_channels=C)
        dg = L.conv_layer_init(jax.random.PRNGKey(8), 2 * C, C)
        x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        z = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), jnp.float32)

        def f_kernel(p, d, a, b):
            zo, ro = PI._fused_dg_vjp(p, d, a, b, 2)
            return jnp.sum(zo ** 2) + jnp.sum(ro ** 2)

        def f_ref(p, d, a, b):
            zo, ro = PI._xla_loop_dg(p, d, a, b, 2)
            return jnp.sum(zo ** 2) + jnp.sum(ro ** 2)

        gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(params, dg, x1, z)
        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(params, dg, x1, z)
        for a, b in zip(jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_fallback_when_unsupported(self):
        from cista_flow_tpu.ops import pallas_ista2 as PI
        rng = np.random.default_rng(7)
        B, H, W, C = 1, 16, 20, 16  # C<32 and W%8!=0 -> unsupported
        params = L.ista_block_init(jax.random.PRNGKey(9), base_channels=C)
        dg = L.conv_layer_init(jax.random.PRNGKey(10), 2 * C, C)
        x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        z = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), jnp.float32)
        assert not PI.supported(x1.shape, z.shape)
        zo, ro = PI.fused_ista_dg(params, dg, x1, z, depth=2)
        zr, rr = PI._xla_loop_dg(params, dg, x1, z, 2)
        np.testing.assert_allclose(np.asarray(zo), np.asarray(zr),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ro), np.asarray(rr),
                                   rtol=1e-5, atol=1e-5)
