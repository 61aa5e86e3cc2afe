"""Vanilla RAFT: image-pair optical flow (NHWC, functional).

The reference keeps a RAFT model alongside DCEIFlow for comparison
(ref: DCEIFlow/RAFT.py:28-149). Exact surface: RGB image pairs in [0, 255]
(normalized to [-1, 1] inside), BasicEncoder features (instance norm) ->
all-pairs correlation pyramid (MXU matmul) -> context encoder (batch norm)
on image1 -> BasicUpdateBlock iterations (same block as E-RAFT:
ref: core/decoder/raft_updater.py:125-147) under ``lax.scan`` -> convex
upsampling per iteration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import encoders as E
from ..nn import gru as G
from ..ops import corr as CORR
from ..ops.pad import ImagePadder
from ..ops.upsample import convex_upsample

HDIM = 128
CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4
COR_PLANES = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2


def init(key, cfg):
    """Image-pair RAFT (ref: RAFT.py:53-57). Returns (params, bn_state)."""
    ks = jax.random.split(key, 3)
    p, s = {}, {}
    p["fnet"], s["fnet"] = E.basic_encoder_init(ks[0], 3, 256, "instance")
    p["cnet"], s["cnet"] = E.basic_encoder_init(ks[1], 3, HDIM + CDIM, "batch")
    p["update"] = G.basic_update_block_init(ks[2], COR_PLANES, HDIM)
    return p, s


def apply(params, state, image1, image2, cfg, iters: int = 12,
          flow_init=None, train: bool = False, collect_preds: bool = True):
    """image1/image2: (B, H, W, 3) RGB in [0, 255] (ref: RAFT.py:89-93).

    Returns the reference dict surface: flow_preds (stacked, padded),
    flow_init (1/8-res), flow_final (unpadded). The reference runs unpadded
    (FlyingChairs2 crops are /8-divisible); min_size=8 padding is a no-op
    there and makes other sizes work.
    """
    padder = ImagePadder(image1.shape[1:3], min_size=8)
    im1 = padder.pad(2.0 * (image1 / 255.0) - 1.0)
    im2 = padder.pad(2.0 * (image2 / 255.0) - 1.0)
    B, H, W, _ = im1.shape
    h8, w8 = H // 8, W // 8

    fmaps, fstate = E.basic_encoder(
        params["fnet"], state["fnet"],
        jnp.concatenate([im1, im2], axis=0), "instance", train=train)
    fmap1, fmap2 = fmaps[:B], fmaps[B:]
    pyr = CORR.build_corr_pyramid(fmap1, fmap2, CORR_LEVELS)

    cnet, cstate = E.basic_encoder(
        params["cnet"], state["cnet"], im1, "batch", train=train)
    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])

    coords0 = CORR.coords_grid(B, h8, w8)
    coords1 = coords0 if flow_init is None else coords0 + flow_init

    mask0 = jnp.zeros((B, h8, w8, 64 * 9), im1.dtype)

    def step(carry, _):
        net, coords1, _ = carry
        coords1 = jax.lax.stop_gradient(coords1)
        c = CORR.lookup_corr(pyr, coords1, CORR_RADIUS)
        flow = coords1 - coords0
        net, mask, delta = G.basic_update_block(params["update"], net, inp,
                                                c, flow)
        coords1 = coords1 + delta
        out = convex_upsample(coords1 - coords0, mask, factor=8) \
            if collect_preds else ()
        return (net, coords1, mask), out

    (net, coords1, mask), flow_preds = jax.lax.scan(
        step, (net, coords1, mask0), None, length=iters)
    if not collect_preds:
        flow_preds = convex_upsample(coords1 - coords0, mask, factor=8)[None]

    out = {
        "flow_preds": flow_preds,           # (iters, B, H_pad, W_pad, 2)
        "flow_init": coords1 - coords0,
        "flow_final": padder.unpad(flow_preds[-1]),
        "fmap2_gt": None,
        "fmap2_pseudo": None,
    }
    return out, {"fnet": fstate, "cnet": cstate}
