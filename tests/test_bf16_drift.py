"""Quantify bf16-serving numerical drift vs f32 over a multi-step recurrence."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from cista_flow_tpu.configs import Config
from cista_flow_tpu.models import composite

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)


def test_bf16_recurrence_drift_small():
    cfg = Config(image_dim=(64, 96), model_mode="cista-eraft", flow_iters=2)
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    voxels = [rng.standard_normal((1, 64, 96, 5)).astype(np.float32)
              for _ in range(4)]

    def run(dtype):
        p = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
        state = jax.tree_util.tree_map(
            lambda x: x.astype(dtype), composite.zero_state(1, cfg))
        rec = jnp.zeros((1, 64, 96, 1), dtype)
        outs = []
        for s in range(3):
            batch = {"event_voxel": jnp.asarray(voxels[s + 1], dtype),
                     "event_voxel_old": jnp.asarray(voxels[s], dtype),
                     "rec_img0": rec}
            rec, _, state, _ = composite.apply(p, mstate, batch, state, cfg)
            outs.append(np.asarray(rec.astype(jnp.float32)))
        return outs

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    for s, (a, b) in enumerate(zip(f32, bf16)):
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        # sigmoid-bounded outputs: bf16 drift should stay far above typical
        # reconstruction quality (~30 dB), i.e. invisible
        assert psnr > 40, f"step {s}: bf16 drift PSNR {psnr:.1f} dB"


def test_ssim_metric_on_chip_matches_cpu():
    """On-chip only: SSIM must stay in [-1, 1] and match the CPU value.

    Regression for a real field failure: the TPU's default conv precision
    (bf16 multiplies) broke the variance cancellation E[x^2]-mu^2 on
    near-flat images (untrained-net output), flipping the cs denominator
    negative and printing ssim=4.30 in eval CSVs — and silently corrupting
    the 1-ssim training-loss term. losses/ssim.py now forces
    Precision.HIGHEST in its blur convs."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend (default-precision convs)")
    from cista_flow_tpu.losses.ssim import _gaussian_kernel, ssim

    def ssim_np(x, y):
        k = _gaussian_kernel(11, 1.5).astype(np.float64)

        def blur(img):
            img = img[0, :, :, 0].astype(np.float64)
            img = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="valid"), 0, img)
            return np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="valid"), 1, img)

        c1, c2 = 0.01 ** 2, 0.03 ** 2
        mu1, mu2 = blur(x), blur(y)
        s1 = blur(x * x) - mu1 * mu1
        s2 = blur(y * y) - mu2 * mu2
        s12 = blur(x * y) - mu1 * mu2
        cs = (2 * s12 + c2) / (s1 + s2 + c2)
        return float(np.mean((2 * mu1 * mu2 + c1)
                             / (mu1 * mu1 + mu2 * mu2 + c1) * cs))

    rng = np.random.default_rng(0)
    gt = rng.random((1, 180, 240, 1)).astype(np.float32)
    # near-flat reconstruction: the catastrophic-cancellation regime
    rec = np.full((1, 180, 240, 1), 0.5, np.float32) \
        + 1e-3 * rng.standard_normal((1, 180, 240, 1)).astype(np.float32)
    for a, b in ((rec, gt), (gt, gt), (rec, rec)):
        tpu_val = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        ref_val = ssim_np(a, b)
        assert abs(tpu_val) <= 1.0 + 1e-3, f"ssim out of range: {tpu_val}"
        assert abs(tpu_val - ref_val) < 5e-3, (tpu_val, ref_val)


def test_flagship_tpu_fastpath_drift():
    """On-chip only: the FULL bf16 serving path (s2d head, merged encoder
    towers, Pallas corr lookup, one-hot/flat-window warps) vs the plain
    f32/XLA path at the flagship resolution. The fast paths are exact at
    their own precision (unit tests); this pins their COMPOSITION's drift
    end-to-end on hardware."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend (fast paths are TPU-gated)")
    cfg = Config(image_dim=(180, 240), model_mode="cista-eiflow")
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    voxels = [rng.standard_normal((1, 180, 240, 5)).astype(np.float32)
              for _ in range(3)]

    def run(dtype):
        p = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            params)
        state = jax.tree_util.tree_map(
            lambda x: x.astype(dtype), composite.zero_state(1, cfg))
        rec = jnp.zeros((1, 180, 240, 1), dtype)
        outs = []
        for s in range(3):
            batch = {"event_voxel": jnp.asarray(voxels[s], dtype),
                     "rec_img0": rec}
            rec, _, state, _ = composite.apply(
                p, mstate, batch, state, cfg, collect_preds=False)
            outs.append(np.asarray(rec.astype(jnp.float32)))
        return outs

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    for s, (a, b) in enumerate(zip(f32, bf16)):
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        # sigmoid-bounded frames; tolerate recurrent bf16 accumulation
        assert psnr > 30.0, f"step {s}: fast-path drift PSNR {psnr:.1f}"
