"""Evaluation metric suite (mirrors the reference's eval surface).

Device metrics (jit-friendly): psnr/mse/ssim/lpips via cista_flow_tpu.losses;
EPE family via losses.flow.flow_evaluate; FWL via losses.fwl.
This module adds the standalone numpy helpers the reference keeps in
utils/evaluate.py:8-42 (used for offline analysis).
"""
from __future__ import annotations

import math

import numpy as np

from ..losses import (  # noqa: F401  (re-exported device metrics)
    flow_evaluate,
    fwl_metric,
    psnr,
    recon_evaluate,
    ssim,
)


def mse_np(imgs1: np.ndarray, imgs2: np.ndarray) -> float:
    """ref: utils/evaluate.py:8-15."""
    return float(np.mean((np.asarray(imgs1) - np.asarray(imgs2)) ** 2))


def psnr_np(imgs1: np.ndarray, imgs2: np.ndarray) -> float:
    """ref: utils/evaluate.py:18-28."""
    m = mse_np(imgs1, imgs2)
    if m < 1e-10:
        return 100.0
    return 20.0 * math.log10(1.0 / math.sqrt(m))


def epe_np(flow_pred: np.ndarray, flow_gt: np.ndarray,
           valid_gt: np.ndarray | None = None) -> dict:
    """Standalone EPE metric dict (ref: loss.py:86-116). Channel-last flow."""
    epe = np.sqrt(np.sum((flow_pred - flow_gt) ** 2, axis=-1)).ravel()
    mag = np.sqrt(np.sum(flow_gt**2, axis=-1)).ravel()
    outlier = (epe > 3.0).astype(np.float32)
    out = ((epe > 3.0) & ((epe / np.maximum(mag, 1e-12)) > 0.05)).astype(np.float32)
    if valid_gt is not None:
        val = valid_gt.ravel() >= 0.5
        epe, out, outlier = epe[val], out[val], outlier[val]
    return {
        "epe": float(epe.mean()),
        "1px": float((epe < 1).mean()),
        "3px": float((epe < 3).mean()),
        "5px": float((epe < 5).mean()),
        "F1": float(out.mean() * 100),
        "ol": float(outlier.mean() * 100),
    }
