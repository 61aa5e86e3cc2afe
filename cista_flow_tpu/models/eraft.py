"""E-RAFT: dense optical flow from two consecutive event voxels (NHWC).

TPU re-design of the reference (ref: ERAFT/eraft.py:37-178): feature encoder
on both voxels -> all-pairs correlation pyramid (MXU matmul) -> context
encoder on the NEWER voxel -> 12 GRU update iterations under ``lax.scan``
(weights constant across iterations) -> convex upsampling.

Returns the same dict surface: flow_preds (stacked, padded), flow_init,
flow_final (unpadded).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import encoders as E
from ..nn import gru as G
from ..ops.fastpath import tpu_bf16
from ..ops import corr as CORR
from ..ops.pad import ImagePadder
from ..ops.upsample import convex_upsample

HDIM = 128
CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4
COR_PLANES = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2


def init(key, cfg):
    """cfg needs: num_bins. Returns (params, bn_state)."""
    k1, k2, k3 = jax.random.split(key, 3)
    p, s = {}, {}
    p["fnet"], s["fnet"] = E.basic_encoder_init(k1, cfg.num_bins, 256, "instance")
    p["cnet"], s["cnet"] = E.basic_encoder_init(k2, cfg.num_bins, HDIM + CDIM, "batch")
    p["update"] = G.basic_update_block_init(k3, COR_PLANES, HDIM)
    return p, s


def apply(params, state, voxel_old, voxel_new, cfg, iters: int = 12,
          flow_init=None, train: bool = False, collect_preds: bool = True,
          encoded=None):
    """voxel_old/new: (B, H, W, num_bins). Returns (out_dict, new_state).

    ``encoded``: optional precomputed (fmap1, fmap2, cnet) — the
    time-parallel serving window computes each voxel's features ONCE
    (consecutive steps share a voxel: fnet(old_t) == fnet(new_{t-1}),
    so the reference's 2x-batched fnet call does every feature map twice
    across a window — composite.apply_sequence_eraft)."""
    padder = ImagePadder(cfg.image_dim, min_size=32)
    im1 = padder.pad(voxel_old)
    im2 = padder.pad(voxel_new)
    B, H, W, _ = im1.shape
    h8, w8 = H // 8, W // 8

    if encoded is not None:
        fmap1, fmap2, cnet = encoded
        fstate, cstate = state["fnet"], state["cnet"]
    elif (getattr(cfg, "encoder_merge", "pair") and not train
            and tpu_bf16(im1)):
        # serving: fnet(new)+cnet(new) share their input — run as one
        # block-diagonal pair tower (nn/encoders.py); fnet(old) stays its
        # own call (PERF.md "Encoder merge")
        fmap1, fstate = E.basic_encoder(
            params["fnet"], state["fnet"], im1, "instance", train=train)
        fmap2, cnet = E.basic_encoder_multi(
            [params["fnet"]], params["cnet"], state["cnet"], [im2, im2])
        cstate = state["cnet"]
    else:
        # batched like the reference's list trick (one encoder call on both)
        fmaps, fstate = E.basic_encoder(
            params["fnet"], state["fnet"],
            jnp.concatenate([im1, im2], axis=0), "instance", train=train)
        fmap1, fmap2 = fmaps[:B], fmaps[B:]
        cnet, cstate = E.basic_encoder(
            params["cnet"], state["cnet"], im2, "batch", train=train)

    pyr = CORR.build_corr_pyramid(fmap1, fmap2, CORR_LEVELS)

    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])

    coords0 = CORR.coords_grid(B, h8, w8)
    coords1 = coords0 if flow_init is None else coords0 + flow_init

    # collect_preds=False skips the per-iteration convex upsample + stacking
    # (training-only outputs); the final flow is upsampled once after scan.
    mask0 = jnp.zeros((B, h8, w8, 64 * 9), im1.dtype)

    # Pallas radix lookup: direct in the serving path; via custom_vjp
    # (einsum-adjoint backward) in the training path. CPU (interpret mode)
    # keeps the einsum lookup.
    from ..ops import pallas_corr as PC
    supported = (PC.supported(pyr.levels[0].shape[1],
                              pyr.levels[0].shape[2],
                              len(pyr.levels))
                 # f32 slabs double the kernel's VMEM scratch past
                 # the 16MB budget at working resolutions; f32
                 # serving (a debug/verification mode) keeps the einsum path
                 and pyr.levels[0].dtype == jnp.bfloat16)
    fast = (not train and not collect_preds and supported
            and getattr(cfg, "serve_pallas", True))
    train_pallas = (supported and not fast
                    and jax.default_backend() == "tpu"
                    and getattr(cfg, "train_pallas", False))
    if fast:
        pyr_t = PC.pad_pyramid_t(pyr)

    fuse_proj = fast and getattr(cfg, "corr_fuse_proj", True)

    def step(carry, _):
        net, coords1, _ = carry
        coords1 = jax.lax.stop_gradient(coords1)
        if fuse_proj:
            c = PC.lookup_corr_pallas(
                pyr_t, coords1, CORR_RADIUS,
                proj=params["update"]["encoder"]["convc1"])
        elif fast:
            c = PC.lookup_corr_pallas(pyr_t, coords1, CORR_RADIUS)
        elif train_pallas:
            c = PC.lookup_corr_trainable(pyr, coords1, CORR_RADIUS)
        else:
            c = CORR.lookup_corr(pyr, coords1, CORR_RADIUS)
        flow = coords1 - coords0
        net, mask, delta = G.basic_update_block(params["update"], net, inp, c,
                                                flow, corr_projected=fuse_proj)
        coords1 = coords1 + delta
        out = convex_upsample(coords1 - coords0, mask, factor=8)             if collect_preds else ()
        return (net, coords1, mask), out

    # serving fully unrolls the GRU iterations (cross-iteration fusion, no
    # carry copies); training keeps the rolled scan for compile-size headroom
    (net, coords1, mask), flow_preds = jax.lax.scan(
        step, (net, coords1, mask0), None, length=iters,
        unroll=iters if not collect_preds else 1)
    if not collect_preds:
        flow_preds = convex_upsample(coords1 - coords0, mask, factor=8)[None]

    flow_final = padder.unpad(flow_preds[-1])
    out = {
        "flow_preds": flow_preds,       # (iters, B, H_pad, W_pad, 2)
        "flow_init": coords1 - coords0,
        "flow_final": flow_final,       # (B, H, W, 2)
    }
    return out, {"fnet": fstate, "cnet": cstate}
