"""Image utilities (host side)."""
from __future__ import annotations

import math

import numpy as np


def normalize_image(image: np.ndarray, low: float = 1, high: float = 99) -> np.ndarray:
    """Percentile-robust normalization to [0, 1]
    (ref: utils/image_process.py:11-18; ECD GT uses low=0, high=100 —
    ref: test_wo_flow.py:157-158)."""
    image = np.asarray(image)
    mini = np.percentile(image.ravel(), low)
    maxi = np.percentile(image.ravel(), high)
    out = (image - mini) / (maxi - mini + 1e-5)
    return np.clip(out, 0.0, 1.0)


def optimal_crop_size(max_size: int, max_subsample_factor: int) -> int:
    """Smallest multiple of 2^f >= max_size (ref: utils/image_process.py:20-26)."""
    p = 2 ** max_subsample_factor
    return int(p * math.ceil(max_size / p))
