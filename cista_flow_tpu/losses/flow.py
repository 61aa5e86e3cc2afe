"""RAFT-style sequence flow loss + flow eval metrics (NHWC).

ref: loss.py:119-303 (``FlowL1LossDict``): gamma-weighted L1 over the
iteration sequence, validity-masked, plus a photometric warp term at every
iteration, plus the x10 pseudo-feature L1 for DCEIFlow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pad import ImagePadder
from ..ops.resize import resize_bilinear
from ..ops.warp import frame_warp

GAMMA = 0.8
MAX_FLOW = 400.0


def validity_mask(gt_img0, gt_img1, gt_flow, warp_mode="forward"):
    """Soft validity: exp(-50 * (warp(I0, gt_flow) - I1)^2) per pixel
    (ref: loss.py:398)."""
    warped = frame_warp(gt_img0, gt_flow, mode=warp_mode)
    return jnp.exp(-50.0 * (warped - gt_img1) ** 2)


def _seq_loss(flow_preds, flow_gt, gt_img0, gt_img1, valid_original,
              warp_mode):
    """flow_preds: (iters, B, H, W, 2) stacked array (dceiflow/eraft) or a
    list of (B, H, W, 2) (idnet), at the same (padded) resolution as
    flow_gt or lower (rescaled per the reference)."""
    n = len(flow_preds)
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1, keepdims=True))
    valid = valid_original * (mag < MAX_FLOW).astype(flow_gt.dtype)

    same_res = tuple(flow_preds[0].shape[1:3]) == tuple(flow_gt.shape[1:3])
    loss = 0.0
    for i in range(n):
        w = GAMMA ** (n - i - 1)
        pred = flow_preds[i]
        if same_res:
            i_loss = jnp.abs(pred - flow_gt)
            photo = jnp.abs(frame_warp(gt_img0, pred, mode=warp_mode) - gt_img1)
            loss = loss + w * jnp.mean(valid * i_loss) + w * jnp.mean(photo)
        else:
            hw = pred.shape[1:3]
            s_gt = resize_bilinear(flow_gt, hw, align_corners=True)
            s_i0 = resize_bilinear(gt_img0, hw, align_corners=True)
            s_i1 = resize_bilinear(gt_img1, hw, align_corners=True)
            i_loss = jnp.abs(pred - s_gt)
            photo = jnp.abs(frame_warp(s_i0, pred, mode=warp_mode) - s_i1)
            s_mag = jnp.sqrt(jnp.sum(s_gt**2, axis=-1, keepdims=True))
            s_valid = resize_bilinear(valid_original, hw, align_corners=True) \
                * (s_mag < MAX_FLOW).astype(flow_gt.dtype)
            loss = loss + w * jnp.mean(s_valid * i_loss) + w * jnp.mean(photo)

    epe = jnp.sqrt(jnp.sum(valid * (flow_preds[-1] - flow_gt) ** 2, axis=-1))
    ok = (valid[..., 0] > 0)
    mean_epe = jnp.sum(jnp.where(ok, epe, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
    return loss, {"flow_l1loss": loss, "epe": mean_epe}


def flow_sequence_loss(batch_flow, batch_target, cfg, is_bi=False):
    """``FlowL1LossDict.forward`` equivalent (ref: loss.py:267-303).

    batch_target: gt_img0/gt_img1/gt_flow/valid (+ _bw twins when is_bi)
    at UNPADDED resolution — padded internally like the reference.
    """
    padder = ImagePadder(cfg.image_dim, min_size=32)
    gt_img0 = padder.pad(batch_target["gt_img0"])
    gt_img1 = padder.pad(batch_target["gt_img1"])
    flow_gt = padder.pad(batch_target["gt_flow"])
    valid = padder.pad(batch_target["valid"])

    loss_fw, metrics = _seq_loss(batch_flow["flow_preds"], flow_gt, gt_img0,
                                 gt_img1, valid, cfg.warp_mode)
    if "fmap2_pseudo" in batch_flow and batch_flow["fmap2_pseudo"] is not None:
        pseudo = 10.0 * jnp.mean(
            jnp.abs(batch_flow["fmap2_pseudo"] - batch_flow["fmap2_gt"]))
        loss_fw = loss_fw + pseudo
        metrics["pseudo"] = pseudo
        metrics["flow_l1loss"] = loss_fw

    if not is_bi:
        return loss_fw, metrics

    flow_gt_bw = padder.pad(batch_target["gt_flow_bw"])
    valid_bw = padder.pad(batch_target["valid_bw"])
    loss_bw, _ = _seq_loss(batch_flow["flow_preds_bw"], flow_gt_bw, gt_img1,
                           gt_img0, valid_bw, cfg.warp_mode)
    if "fmap1_pseudo" in batch_flow and batch_flow["fmap1_pseudo"] is not None:
        loss_bw = loss_bw + 10.0 * jnp.mean(
            jnp.abs(batch_flow["fmap1_pseudo"] - batch_flow["fmap1_gt"]))
    total = 0.5 * (loss_fw + loss_bw)
    metrics["flow_l1loss"] = total
    return total, metrics


def flow_evaluate(flow_final, batch_target, cfg):
    """``FlowL1LossDict.evaluate`` (ref: loss.py:237-265): photometric loss,
    masked EPE, >1/3/5px outlier rates, KITTI-style out%."""
    if "flow_valid" in batch_target:
        valid_original = batch_target["flow_valid"]
    else:
        valid_original = validity_mask(
            batch_target["gt_img0"], batch_target["gt_img1"],
            batch_target["gt_flow"], cfg.warp_mode)
    gt_flow = batch_target["gt_flow"]
    mag = jnp.sqrt(jnp.sum(gt_flow**2, axis=-1, keepdims=True))
    valid = valid_original * (mag < MAX_FLOW).astype(gt_flow.dtype)

    photo = jnp.mean(jnp.abs(
        frame_warp(batch_target["gt_img0"], flow_final, cfg.warp_mode)
        - batch_target["gt_img1"]))
    epe = jnp.sqrt(jnp.sum(valid * (flow_final - gt_flow) ** 2, axis=-1))
    out = ((epe > 3.0) & ((epe / mag[..., 0]) > 0.05)).astype(jnp.float32)

    ok = valid[..., 0] > 0
    cnt = jnp.maximum(jnp.sum(ok), 1)

    def masked_mean(x):
        return jnp.sum(jnp.where(ok, x, 0.0)) / cnt

    return {
        "photo_loss": photo,
        "epe": masked_mean(epe),
        "1px": masked_mean((epe > 1).astype(jnp.float32)),
        "3px": masked_mean((epe > 3).astype(jnp.float32)),
        "5px": masked_mean((epe > 5).astype(jnp.float32)),
        "out": masked_mean(out) * 100.0,
    }
