"""DCEIFlow: event + single-image optical flow with hallucinated second-frame
features (NHWC, functional).

TPU re-design of the reference (ref: DCEIFlow/DCEIFlow.py:49-300):
image encoder (1ch) + event encoder (num_bins) -> EIFusion produces a
pseudo second-frame feature map -> all-pairs correlation pyramid (MXU) ->
context encoder -> 6 GRU iterations under ``lax.scan`` -> flow upsampled with
``upflow{ds}`` (no learned mask — BasicUpdateBlockNoMask).

The bidirectional branch (image2 + reversed events, training only) reuses the
same weights on the swapped inputs (ref: DCEIFlow.py:230-270).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import encoders as E
from ..nn import gru as G
from ..ops.fastpath import tpu_bf16
from ..ops import corr as CORR
from ..ops.pad import ImagePadder
from ..ops.resize import upflow

HDIM = 128
CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4
COR_PLANES = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2


def init(key, cfg):
    """cfg needs: num_bins, ds. Returns (params, bn_state)."""
    ks = jax.random.split(key, 5)
    p, s = {}, {}
    p["fnet"], s["fnet"] = E.basic_encoder_init(ks[0], 1, 256, "instance")
    p["enet"], s["enet"] = E.basic_encoder_init(ks[1], cfg.num_bins, 256, "instance")
    p["cnet"], s["cnet"] = E.basic_encoder_init(ks[2], 1, HDIM + CDIM, "batch")
    kf = jax.random.split(ks[3], 3)
    from ..ops import conv as C
    p["fusion"] = {
        "conv1": C.conv_params(kf[0], 1, 1, 256, 192),
        "conv2": C.conv_params(kf[1], 1, 1, 256, 192),
        "convo": C.conv_params(kf[2], 3, 3, 384, 256),
    }
    p["update"] = G.basic_update_block_event_init(ks[4], COR_PLANES, HDIM)
    return p, s


def _fusion(p, x1, x2):
    """EIFusion (ref: DCEIFlow/DCEIFlow.py:32-44): residual event-image fusion."""
    from ..ops import conv as C
    c1 = jax.nn.relu(C.apply_conv(p["conv1"], x1))
    c2 = jax.nn.relu(C.apply_conv(p["conv2"], x2))
    out = jax.nn.relu(C.apply_conv(
        p["convo"], jnp.concatenate([c1, c2], axis=-1), padding=1))
    return out + x1


def _iterate(params, net, inp, pyr, coords0, coords1, emap, ds, padder, iters,
             collect_preds=True, cfg=None):
    """collect_preds: emit the full-res upsampled flow at EVERY iteration
    (training loss needs the sequence — ref: DCEIFlow.py:209-227). Inference
    only consumes the final flow, so the per-iteration x8 upsample + stacking
    (the dominant cost of the scan body on TPU) is skipped when False."""
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
    fast = (not collect_preds and supported
            and getattr(cfg, "serve_pallas", True))
    train_pallas = (supported and not fast
                    and jax.default_backend() == "tpu"
                    and getattr(cfg, "train_pallas", False))
    if fast:
        pyr_t = PC.pad_pyramid_t(pyr)

    fuse_proj = fast and getattr(cfg, "corr_fuse_proj", True)

    # event motion features are identical in every GRU iteration; computed
    # once here since XLA cannot hoist them out of the scan body
    ema = G.precompute_update_ema(params["update"], emap)

    def step(carry, _):
        net, coords1 = carry
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
        net, _, delta = G.basic_update_block_event(
            params["update"], net, inp, c, ema, flow,
            corr_projected=fuse_proj, ema_precomputed=True)
        coords1 = coords1 + delta
        out = upflow(coords1 - coords0, ds) if collect_preds else ()
        return (net, coords1), out

    # serving (collect_preds=False) fully unrolls: cross-iteration fusion and
    # no per-iteration carry copies; training keeps the rolled scan (graph
    # size drives the remote-compile ceiling for large BPTT, PERF.md)
    (net, coords1), flow_preds = jax.lax.scan(
        step, (net, coords1), None, length=iters,
        unroll=iters if not collect_preds else 1)
    if not collect_preds:
        flow_preds = upflow(coords1 - coords0, ds)[None]
    return net, coords1, flow_preds


def _single_direction(params, state, emap, fmap1, image1_pad, cfg, iters,
                      flow_init, train, collect_preds=True, cnet_pre=None):
    pseudo_fmap2 = _fusion(params["fusion"], fmap1, emap)
    pyr = CORR.build_corr_pyramid(fmap1, pseudo_fmap2, CORR_LEVELS)

    if cnet_pre is not None:
        cnet, cstate = cnet_pre, state["cnet"]
    else:
        cnet, cstate = E.basic_encoder(
            params["cnet"], state["cnet"], image1_pad, "batch", train=train)
    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])

    B, H, W, _ = image1_pad.shape
    ds = cfg.ds
    coords0 = CORR.coords_grid(B, H // ds, W // ds)
    coords1 = coords0 if flow_init is None else coords0 + flow_init

    padder = ImagePadder(cfg.image_dim, min_size=32)
    net, coords1, flow_preds = _iterate(
        params, net, inp, pyr, coords0, coords1, emap, ds, padder, iters,
        collect_preds=collect_preds, cfg=cfg)
    return coords1 - coords0, flow_preds, pseudo_fmap2, cstate


def apply(params, state, event_voxel, image1, cfg, image2=None,
          reversed_event_voxel=None, iters: int = 6, flow_init=None,
          train: bool = False, collect_preds: bool = True):
    """event_voxel: (B,H,W,bins); image1: (B,H,W,1) in [0,1].

    Returns (out_dict, new_state). Dict keys mirror the reference
    (flow_preds / flow_init / flow_final [+ fmap2_gt/fmap2_pseudo and the _bw
    family when image2 / reversed events are given]).
    """
    padder = ImagePadder(cfg.image_dim, min_size=32)
    im1 = padder.pad(2.0 * image1 - 1.0)
    ev = padder.pad(event_voxel)

    cnet_pre = None
    merge = getattr(cfg, "encoder_merge", "pair")
    if merge and not train and image2 is None and tpu_bf16(im1):
        # serving: encoders merged into one block-diagonal tower (exact;
        # nn/encoders.py basic_encoder_multi, PERF.md "Encoder trio").
        # "pair" merges fnet+enet only — the 3-tower dense merge measured
        # e2e-negative (MAC inflation outruns the MFU gain past 2 towers).
        if merge == "trio":
            fmap1, emap, cnet_pre = E.basic_encoder_trio(
                params["fnet"], params["enet"], params["cnet"],
                state["cnet"], im1, ev, im1)
        else:
            fmap1, emap = E.basic_encoder_multi(
                [params["fnet"], params["enet"]], None, None, [im1, ev])
        estate, fstate = state["enet"], state["fnet"]
        fmap2 = None
    else:
        emap, estate = E.basic_encoder(
            params["enet"], state["enet"], ev, "instance", train=train)
        if image2 is not None:
            im2 = padder.pad(2.0 * image2 - 1.0)
            B = im1.shape[0]
            fmaps, fstate = E.basic_encoder(
                params["fnet"], state["fnet"],
                jnp.concatenate([im1, im2], axis=0), "instance", train=train)
            fmap1, fmap2 = fmaps[:B], fmaps[B:]
        else:
            fmap1, fstate = E.basic_encoder(
                params["fnet"], state["fnet"], im1, "instance", train=train)
            fmap2 = None

    flow_lowres, flow_preds, pseudo_fmap2, cstate = _single_direction(
        params, state, emap, fmap1, im1, cfg, iters, flow_init, train,
        collect_preds=collect_preds, cnet_pre=cnet_pre)
    flow_final = padder.unpad(flow_preds[-1])

    out = {
        "flow_preds": flow_preds,   # (iters, B, H_pad, W_pad, 2)
        "flow_init": flow_lowres,
        "flow_final": flow_final,
    }
    new_state = {"fnet": fstate, "enet": estate, "cnet": cstate}

    if image2 is not None:
        out["fmap2_gt"] = fmap2
        out["fmap2_pseudo"] = pseudo_fmap2

    if image2 is not None and reversed_event_voxel is not None:
        rev = padder.pad(reversed_event_voxel)
        remap, _ = E.basic_encoder(
            params["enet"], state["enet"], rev, "instance", train=train)
        pseudo_fmap1 = _fusion(params["fusion"], fmap2, remap)
        im2 = padder.pad(2.0 * image2 - 1.0)
        _, flow_preds_bw, _, _ = _single_direction(
            params, state, remap, fmap2, im2, cfg, iters, flow_init, train)
        out["flow_preds_bw"] = flow_preds_bw
        # reference keeps the backward final flow PADDED (no unpad on the bw
        # path, ref: DCEIFlow.py:253-279); only the loss consumes it.
        out["flow_final_bw"] = flow_preds_bw[-1]
        out["fmap1_gt"] = fmap1
        out["fmap1_pseudo"] = pseudo_fmap1
    return out, new_state
