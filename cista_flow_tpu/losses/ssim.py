"""SSIM matching pytorch_msssim (gaussian window 11, sigma 1.5, valid padding).

The reference uses ``pytorch_msssim.SSIM(data_range=1, size_average=True,
channel=1, nonnegative_ssim=False)`` (ref: loss.py:314). That implementation:
separable 1D gaussian filter, no padding (output shrinks by win_size-1),
K1=0.01, K2=0.03, and returns mean over the ssim map.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(win_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(win_size) - win_size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian blur on NHWC (per-channel).

    Precision HIGHEST is load-bearing: SSIM's variances come from the
    cancellation E[x^2] - mu^2, and the TPU's default conv precision (bf16
    multiplies) leaves rounding residue ~1e-2 on near-flat images — larger
    than c2 = 9e-4, which flips the cs denominator negative and produces
    |SSIM| >> 1. (Observed on-chip: untrained-net eval printed ssim 4.30.)
    """
    k = jnp.asarray(kernel)
    c = x.shape[-1]
    kh = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return y


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5,
         nonnegative: bool = False) -> jnp.ndarray:
    """Mean SSIM over the batch (NHWC inputs). Matches pytorch_msssim."""
    k = _gaussian_kernel(win_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mu1 = _blur(x, k)
    mu2 = _blur(y, k)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(x * x, k) - mu1_sq
    sigma2_sq = _blur(y * y, k) - mu2_sq
    sigma12 = _blur(x * y, k) - mu12

    cs = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    m = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    if nonnegative:
        m = jax.nn.relu(m)
    return jnp.mean(m)
