"""Reconstruction loss + combined FlowReconLoss (NHWC).

ref: loss.py:306-411. ReconLoss = LPIPS + L1 + (1 - SSIM) + optional 5x
masked temporal-consistency L1 against the flow-warped previous
reconstruction. FlowReconLoss computes the soft validity mask and dispatches
rec / flow / both.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lpips as lpips_mod
from .flow import flow_sequence_loss, validity_mask
from .ssim import ssim
from ..ops.warp import frame_warp


def psnr(img1, img2, data_range: float = 1.0):
    """ref: loss.py:15-24."""
    mse = jnp.mean((img1 - img2) ** 2)
    return jnp.where(mse < 1e-10, 100.0,
                     20.0 * jnp.log10(data_range / jnp.sqrt(mse)))


def recon_loss(out, rec_img0, batch_target, cfg, lpips_params=None,
               is_loss_consis=True):
    """``ReconLoss.forward`` (ref: loss.py:331-354). Returns (loss, dict)."""
    gt = batch_target["gt_img1"]
    # ``is_loss_consis`` may be a traced bool (lax.scan over the unroll):
    # compute the term branch-free and gate it with a multiply.
    if isinstance(is_loss_consis, bool) and not is_loss_consis:
        consis = 0.0
    else:
        m = batch_target["valid"]
        warped_prev = frame_warp(rec_img0, batch_target["gt_flow"], cfg.warp_mode)
        consis = 5.0 * jnp.mean(m * jnp.abs(warped_prev - out))
        consis = consis * jnp.asarray(is_loss_consis, consis.dtype)
    l1 = jnp.mean(jnp.abs(out - gt))
    ssim_loss = 1.0 - ssim(out, gt, data_range=1.0)
    lp = (lpips_mod.lpips(lpips_params, out, gt, normalize=True)
          if lpips_params is not None else 0.0)
    loss = lp + l1 + ssim_loss + consis
    return loss, {
        "LPIPS": lp, "L1": l1, "SSIM": ssim_loss,
        "loss_consistency": consis, "loss_rec": loss - consis,
        "loss_rec_all": loss,
    }


def recon_evaluate(rec_img, target_img, lpips_params=None):
    """``ReconLoss.evaluate`` (ref: loss.py:316-328)."""
    metrics = {
        "mse": jnp.mean((rec_img - target_img) ** 2),
        "psnr": psnr(rec_img, target_img),
        "ssim": ssim(rec_img, target_img),
    }
    if lpips_params is not None:
        metrics["lpips"] = lpips_mod.lpips(lpips_params, rec_img, target_img,
                                           normalize=True)
    return metrics


def flow_recon_loss(out, rec_img0, batch_flow, batch_target, cfg,
                    loss_mode: str, lpips_params=None, is_loss_consis=True):
    """``FlowReconLoss.forward`` (ref: loss.py:396-411). Scalar total loss."""
    assert loss_mode in ("rec", "flow", "both")
    batch_target = dict(batch_target)
    batch_target["valid"] = validity_mask(
        batch_target["gt_img0"], batch_target["gt_img1"],
        batch_target["gt_flow"], cfg.warp_mode)
    loss = 0.0
    if loss_mode in ("rec", "both"):
        loss = loss + recon_loss(out, rec_img0, batch_target, cfg,
                                 lpips_params, is_loss_consis)[0]
    if loss_mode in ("flow", "both"):
        if cfg.is_bi:
            batch_target["valid_bw"] = validity_mask(
                batch_target["gt_img1"], batch_target["gt_img0"],
                batch_target["gt_flow_bw"], cfg.warp_mode)
        loss = loss + flow_sequence_loss(batch_flow, batch_target, cfg,
                                         is_bi=cfg.is_bi)[0]
    return loss
