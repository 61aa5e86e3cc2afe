"""Vanilla RAFT: image-pair optical flow (NHWC, functional).

The reference keeps a RAFT model alongside DCEIFlow for comparison
(ref: DCEIFlow/RAFT.py:28-149, decoder twin ref:
DCEIFlow/core/decoder/raft_updater.py). Same encoders/correlation machinery
as ERAFT but fed with two grayscale images; flow upsampled with upflow{ds}
(the no-mask update block).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import encoders as E
from ..nn import gru as G
from ..ops import conv as C
from ..ops import corr as CORR
from ..ops.pad import ImagePadder
from ..ops.resize import upflow

HDIM = 128
CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4
COR_PLANES = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2


def _raft_motion_encoder_init(key, cor_planes):
    """Event-free motion encoder, DCEIFlow flavor (ref: raft_updater.py)."""
    return G.basic_motion_encoder_init(key, cor_planes)


def init(key, cfg):
    """Image-pair RAFT. cfg needs: ds. Returns (params, bn_state)."""
    ks = jax.random.split(key, 3)
    p, s = {}, {}
    p["fnet"], s["fnet"] = E.basic_encoder_init(ks[0], 1, 256, "instance")
    p["cnet"], s["cnet"] = E.basic_encoder_init(ks[1], 1, HDIM + CDIM, "batch")
    ku = jax.random.split(ks[2], 3)
    p["update"] = {
        "encoder": _raft_motion_encoder_init(ku[0], COR_PLANES),
        "gru": G.sep_conv_gru_init(ku[1], HDIM, 128 + HDIM),
        "flow_head": G.flow_head_init(ku[2], HDIM, 256),
    }
    return p, s


def apply(params, state, image1, image2, cfg, iters: int = 12,
          flow_init=None, train: bool = False):
    """image1/image2: (B, H, W, 1) in [0, 1]."""
    padder = ImagePadder(cfg.image_dim, min_size=32)
    im1 = padder.pad(2.0 * image1 - 1.0)
    im2 = padder.pad(2.0 * image2 - 1.0)
    B, H, W, _ = im1.shape
    ds = cfg.ds

    fmaps, fstate = E.basic_encoder(
        params["fnet"], state["fnet"],
        jnp.concatenate([im1, im2], axis=0), "instance", train=train)
    fmap1, fmap2 = fmaps[:B], fmaps[B:]
    pyr = CORR.build_corr_pyramid(fmap1, fmap2, CORR_LEVELS)

    cnet, cstate = E.basic_encoder(
        params["cnet"], state["cnet"], im1, "batch", train=train)
    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])

    coords0 = CORR.coords_grid(B, H // ds, W // ds)
    coords1 = coords0 if flow_init is None else coords0 + flow_init

    def step(carry, _):
        net, coords1 = carry
        coords1 = jax.lax.stop_gradient(coords1)
        c = CORR.lookup_corr(pyr, coords1, CORR_RADIUS).astype(net.dtype)
        flow = (coords1 - coords0).astype(net.dtype)
        motion = G.basic_motion_encoder(params["update"]["encoder"], flow, c)
        new_net = G.sep_conv_gru(params["update"]["gru"], net,
                                 jnp.concatenate([inp, motion], axis=-1))
        delta = G.flow_head(params["update"]["flow_head"], new_net)
        coords1 = coords1 + delta
        return (new_net, coords1), upflow(coords1 - coords0, ds)

    (net, coords1), flow_preds = jax.lax.scan(step, (net, coords1), None,
                                              length=iters)
    return {
        "flow_preds": flow_preds,
        "flow_init": coords1 - coords0,
        "flow_final": padder.unpad(flow_preds[-1]),
    }, {"fnet": fstate, "cnet": cstate}
