"""Pallas corr-lookup kernel parity vs the einsum lookup (the pinned path).

The einsum path (ops/corr.py:lookup_corr) is itself pinned against the torch
reference in test_ops_parity/test_randomized_sweeps; exactness here extends
that pin to the kernel. On CPU the kernel runs in interpret mode — same math.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cista_flow_tpu.ops import corr as CORR
from cista_flow_tpu.ops import pallas_corr as PC

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)


def _pyramid(rng, B, H1, W1, D=32, dtype=jnp.float32):
    f1 = jnp.asarray(rng.standard_normal((B, H1, W1, D)), dtype)
    f2 = jnp.asarray(rng.standard_normal((B, H1, W1, D)), dtype)
    return CORR.build_corr_pyramid(f1, f2)


@pytest.mark.parametrize("shape", [(1, 16, 24), (2, 24, 32), (1, 13, 17)])
def test_lookup_parity_random_coords(shape):
    B, H1, W1 = shape
    rng = np.random.default_rng(42)
    pyr = _pyramid(rng, B, H1, W1)
    pyr_t = PC.pad_pyramid_t(pyr)

    coords = CORR.coords_grid(B, H1, W1) + jnp.asarray(
        rng.standard_normal((B, H1, W1, 2)) * 3.0, jnp.float32)
    ref = CORR.lookup_corr(pyr, coords)
    out = PC.lookup_corr_pallas(pyr_t, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_lookup_parity_extreme_out_of_range():
    """Zeros-padding semantics for coords far outside every pyramid level."""
    B, H1, W1 = 1, 16, 24
    rng = np.random.default_rng(7)
    pyr = _pyramid(rng, B, H1, W1)
    pyr_t = PC.pad_pyramid_t(pyr)

    offs = np.zeros((B, H1, W1, 2), np.float32)
    offs[0, ::3] = 100.0       # far beyond the level-0 extent
    offs[0, 1::3] = -57.3      # far negative, fractional
    offs[0, 2::3, :, 0] = 23.9  # straddling the right boundary
    coords = CORR.coords_grid(B, H1, W1) + jnp.asarray(offs)

    ref = CORR.lookup_corr(pyr, coords)
    out = PC.lookup_corr_pallas(pyr_t, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_lookup_parity_boundary_sweep():
    """Dense sweep of fractional coords across the clamp boundaries."""
    B, H1, W1 = 1, 8, 8
    rng = np.random.default_rng(3)
    pyr = _pyramid(rng, B, H1, W1, D=16)
    pyr_t = PC.pad_pyramid_t(pyr)

    # sweep x in [-7, 15] finely, y fixed mid-range; then the transpose
    vals = np.linspace(-7.0, 15.0, 64, dtype=np.float32)
    coords = np.zeros((B, H1, W1, 2), np.float32)
    coords[..., 0] = vals[:64].reshape(8, 8)
    coords[..., 1] = 4.25
    for swap in (False, True):
        c = coords[..., ::-1].copy() if swap else coords
        ref = CORR.lookup_corr(pyr, jnp.asarray(c))
        out = PC.lookup_corr_pallas(pyr_t, jnp.asarray(c))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_lookup_under_jit_and_scan():
    """Kernel composes under jit + lax.scan (the GRU-loop usage)."""
    B, H1, W1 = 1, 16, 24
    rng = np.random.default_rng(5)
    pyr = _pyramid(rng, B, H1, W1)
    pyr_t = PC.pad_pyramid_t(pyr)
    coords0 = CORR.coords_grid(B, H1, W1)

    @jax.jit
    def run(c0):
        def body(c, _):
            w = PC.lookup_corr_pallas(pyr_t, c)
            return c + 0.1 * w[..., :2], w
        _, ws = jax.lax.scan(body, c0, None, length=3)
        return ws

    ws = run(coords0)
    c = coords0
    for s in range(3):
        ref = CORR.lookup_corr(pyr, c)
        np.testing.assert_allclose(np.asarray(ws[s]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"step {s}")
        c = c + 0.1 * ref[..., :2]


def test_in_model_fast_path_matches_einsum_path():
    """collect_preds=False routes through the Pallas lookup (bf16 serving —
    the kernel is gated to bf16 slabs, f32 serving keeps the einsum path);
    flow_final must match the einsum-lookup path at bf16 rounding."""
    import types

    from cista_flow_tpu.models import eraft

    cfg = types.SimpleNamespace(image_dim=(64, 96), num_bins=5)
    params, state = eraft.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    rng = np.random.default_rng(17)
    v0 = jnp.asarray(rng.standard_normal((1, 64, 96, 5)), jnp.bfloat16)
    v1 = jnp.asarray(rng.standard_normal((1, 64, 96, 5)), jnp.bfloat16)

    ref, _ = eraft.apply(params, state, v0, v1, cfg, iters=4,
                         collect_preds=True)
    out, _ = eraft.apply(params, state, v0, v1, cfg, iters=4,
                         collect_preds=False)
    np.testing.assert_allclose(np.asarray(out["flow_final"], np.float32),
                               np.asarray(ref["flow_final"], np.float32),
                               rtol=5e-2, atol=5e-2)

    # the f32 serving path must NOT take the kernel (VMEM budget) — both
    # modes then agree tightly through the einsum lookup
    pf32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if x.dtype == jnp.bfloat16 else x, params)
    ref32, _ = eraft.apply(pf32, state, v0.astype(jnp.float32),
                           v1.astype(jnp.float32), cfg, iters=4,
                           collect_preds=True)
    out32, _ = eraft.apply(pf32, state, v0.astype(jnp.float32),
                           v1.astype(jnp.float32), cfg, iters=4,
                           collect_preds=False)
    np.testing.assert_allclose(np.asarray(out32["flow_final"]),
                               np.asarray(ref32["flow_final"]),
                               rtol=1e-4, atol=1e-4)


def test_trainable_lookup_value_and_grad_match_einsum():
    """custom_vjp path: Pallas forward must match the einsum lookup, and its
    backward (the einsum adjoint) must equal jax.grad through the einsum
    path — for both the pyramid and the coords cotangents."""
    B, H1, W1 = 1, 16, 24
    rng = np.random.default_rng(3)
    pyr = _pyramid(rng, B, H1, W1)
    coords = CORR.coords_grid(B, H1, W1) + jnp.asarray(
        rng.standard_normal((B, H1, W1, 2)) * 2.0, jnp.float32)
    gcot = jnp.asarray(rng.standard_normal((B, H1, W1, 4 * 81)), jnp.float32)

    def loss_pallas(levels, c):
        out = PC.lookup_corr_trainable(
            CORR.CorrPyramid(levels, pyr.batch, pyr.h1, pyr.w1), c)
        return jnp.sum(out * gcot)

    def loss_einsum(levels, c):
        out = CORR.lookup_corr(
            CORR.CorrPyramid(levels, pyr.batch, pyr.h1, pyr.w1), c)
        return jnp.sum(out * gcot)

    va, (gla, gca) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(
        pyr.levels, coords)
    vb, (glb, gcb) = jax.value_and_grad(loss_einsum, argnums=(0, 1))(
        pyr.levels, coords)
    assert float(va) == pytest.approx(float(vb), rel=1e-4)
    for a, b in zip(gla, glb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gca), np.asarray(gcb),
                               rtol=1e-4, atol=1e-4)


def test_fused_projection_matches_separate_conv():
    """proj= fuses relu(convc1(lookup)) into the kernel via an in-kernel MXU
    contraction; must match the separate 1x1 conv at bf16 rounding (the fused
    form is single-rounded: lookup windows never round-trip bf16 in HBM)."""
    from cista_flow_tpu.ops import conv as C

    B, H1, W1 = 2, 12, 16
    rng = np.random.default_rng(3)
    pyr = _pyramid(rng, B, H1, W1, dtype=jnp.bfloat16)
    pyr_t = PC.pad_pyramid_t(pyr)
    coords = CORR.coords_grid(B, H1, W1) + jnp.asarray(
        rng.standard_normal((B, H1, W1, 2)) * 4.0, jnp.float32)

    proj = C.conv_params(jax.random.PRNGKey(1), 1, 1, 324, 256)
    proj = {"w": proj["w"].astype(jnp.bfloat16), "b": proj["b"]}

    fused = PC.lookup_corr_pallas(pyr_t, coords, proj=proj)
    lookup = PC.lookup_corr_pallas(pyr_t, coords)
    ref = jax.nn.relu(C.apply_conv(proj, lookup.astype(jnp.bfloat16)))
    assert fused.dtype == jnp.bfloat16 and fused.shape == (B, H1, W1, 256)
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.01)
