"""IDNet (IDEDEQIDO): correlation-free flow via iterative deblurring (NHWC).

TPU re-design of the reference (ref: idn/idedeq.py:13-235): each deblur
iteration warps every temporal bin of the voxel toward bin 0 along the
current flow, folds per-bin LiteEncoder features into a ConvGRU, and emits a
convex-upsampled delta-flow plus (optionally) a next-step flow prediction
used as ``flow_init`` chaining (CISTA-Flow config: update_iters=1,
pred_next_flow=True — ref: e2v/e2v_model.py:256-261).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import encoders as E
from ..nn import gru as G
from ..ops import conv as _C
from ..ops.pad import ImagePadder
from ..ops.upsample import convex_upsample
from ..ops.warp import grid_sample

HIDDEN_DIM = 96
INPUT_DIM = 64
DOWNSAMPLE = 8


def init(key, cfg, pred_next_flow: bool = True, input_flowmap: bool = False):
    k1, k2, k3 = jax.random.split(key, 3)
    fnet, strides = E.lite_encoder_init(k1, n_first_channels=2,
                                        output_dim=INPUT_DIM // 2, stride=2)
    p = {
        "fnet": fnet,
        "update": G.lite_update_block_init(
            k2, HIDDEN_DIM, INPUT_DIM,
            num_outputs=2 if pred_next_flow else 1, downsample=DOWNSAMPLE),
    }
    if input_flowmap:
        # context encoder over the running flow map (ref: idn/idedeq.py:42-46)
        p["cnet"], _ = E.lite_encoder_init(k3, n_first_channels=2,
                                           output_dim=HIDDEN_DIM // 2, stride=2)
    return p


def _deblur(voxel: jnp.ndarray, flow: jnp.ndarray,
            mode: str = "voxel") -> jnp.ndarray:
    """Warp bin t of (B,H,W,V) along the scaled flow
    (ref: idn/idedeq.py:74-92; align_corners=False, zeros padding).
    mode='voxel': scale = t/(V-1); mode='patch'-style: (t+0.5)/V
    (ref: idedeq.py:81-84 deblur_mode branch)."""
    B, H, W, V = voxel.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    # one batched warp over all bins (bins folded onto the batch axis):
    # per-bin math is unchanged, but the gather runs as a single launch
    scales = jnp.asarray(
        [t / (V - 1) if mode == "voxel" else (t + 0.5) / V
         for t in range(V)], jnp.float32).reshape(V, 1, 1, 1)
    gx = (xx[None] + flow[None, ..., 0] * scales) / (W - 1) * 2.0 - 1.0
    gy = (yy[None] + flow[None, ..., 1] * scales) / (H - 1) * 2.0 - 1.0
    grid = jnp.stack([gx, gy], axis=-1).reshape(V * B, H, W, 2)
    src = jnp.transpose(voxel, (3, 0, 1, 2)).reshape(V * B, H, W, 1)
    out = grid_sample(src, grid, align_corners=False, padding_mode="zeros")
    return jnp.transpose(out.reshape(V, B, H, W), (1, 2, 3, 0))


def apply(params, event_bins, cfg, flow_init=None, deblur_iters: int = 1,
          pred_next_flow: bool = True, deblur_mode: str = "voxel",
          input_flowmap: bool = False, deblur: bool = True,
          add_delta: bool = False, collect_preds: bool = True):
    """event_bins: (B, H, W, V). Returns the reference dict surface:
    flow_final (unpadded), next_flow (padded), flow_preds, delta_flow.
    ``collect_preds=False`` (serving) leaves flow_preds/delta_flow history
    empty, matching the eiflow/eraft inference fast path.

    Live reference branches (ref: idn/idedeq.py:157-210):
    * ``input_flowmap``: GRU state seeded from a context encoder over the
      running flow map (from iteration 1, or iteration 0 with a flow_init)
      instead of zeros
    * ``deblur=False``: encode the raw voxel each iteration (no warping);
      then flow_total is *replaced* by delta_flow unless ``add_delta``
    (co_mode / conr_mode are fully commented out upstream —
    idedeq.py:126-146 — and intentionally not reproduced.)
    """
    padder = ImagePadder(cfg.image_dim, min_size=32)
    x_raw = padder.pad(event_bins)
    B, H, W, V = x_raw.shape

    flow_total = (jnp.zeros((B, H, W, 2), x_raw.dtype)
                  if flow_init is None else flow_init)
    delta_flow = flow_total
    x_deblur = x_raw
    flow_preds = []
    delta_flow_hist = [delta_flow]  # ref seeds history with the init flow
    next_flow = None

    for it in range(deblur_iters):
        if deblur:
            x_deblur = _deblur(x_deblur, delta_flow, mode=deblur_mode)
            src = x_deblur
        else:
            src = x_raw
        if input_flowmap and (flow_init is not None or it >= 1):
            net = E.lite_encoder(params["cnet"], flow_total,
                                 stage_strides=(2, 2))
        else:
            net = jnp.zeros((B, H // DOWNSAMPLE, W // DOWNSAMPLE, HIDDEN_DIM),
                            x_raw.dtype)
        # fold per-bin features: slice = (B, H, W, 2) (bin duplicated, ref
        # stacks [x_deblur, x_deblur] on a channel axis — idn/idedeq.py:166).
        # The V encoder calls are independent of the GRU recurrence, so they
        # run as ONE batched call (bins on the batch axis — 5x the MXU batch
        # per launch); only the GRU folds stay sequential.
        sb = jnp.transpose(src, (3, 0, 1, 2)).reshape(V * B, H, W, 1)
        feats = E.lite_encoder(params["fnet"],
                               jnp.concatenate([sb, sb], -1),
                               stage_strides=(2, 2))
        feats = feats.reshape(V, B, *feats.shape[1:])
        for t_idx in range(V):
            net = G.conv_gru(params["update"]["gru"], net, feats[t_idx])

        # all active heads read the same net: run their conv1 stages as ONE
        # conv (2 or 4 pass-bound 1/8-res launches -> 1; exact)
        up = params["update"]
        heads = [up["flow_head"], up["mask"]]
        if pred_next_flow:
            heads += [up["flow_head2"], up["mask2"]]
        acts = G.fused_head_stage1(heads, net)
        dflow = _C.apply_conv(up["flow_head"]["conv2"], acts[0], padding=1)
        up_mask = _C.apply_conv(up["mask"]["conv2"], acts[1])
        delta_flow = convex_upsample(dflow, up_mask, factor=DOWNSAMPLE,
                                     flow_scale=8)
        if collect_preds:
            delta_flow_hist.append(delta_flow)
        if pred_next_flow:
            nflow = _C.apply_conv(up["flow_head2"]["conv2"], acts[2],
                                  padding=1)
            up_mask2 = _C.apply_conv(up["mask2"]["conv2"], acts[3])
            next_flow = convex_upsample(nflow, up_mask2, factor=DOWNSAMPLE,
                                        flow_scale=8)
        if deblur or add_delta:
            flow_total = flow_total + delta_flow
        else:
            flow_total = delta_flow
        if collect_preds:
            flow_preds.append(flow_total)

    return {
        "flow_final": padder.unpad(flow_total),
        "next_flow": next_flow,
        "flow_preds": flow_preds,
        "delta_flow": delta_flow_hist,
    }


def rec_ide(params, batch, cfg, flow_init=None, deblur_iters: int = 1,
            pred_next_flow: bool = True, yield_every: int = 4):
    """Sequence generator variant (RecIDE, ref: idn/idedeq.py:275-306):
    chains ``next_flow`` across a sequence of voxels, yielding accumulated
    trajectories every ``yield_every`` steps (flow_init detached at yields)."""
    flow_traj, next_traj = [], []
    for t_idx, x in enumerate(batch):
        out = apply(params, x, cfg, flow_init=flow_init,
                    deblur_iters=deblur_iters,
                    pred_next_flow=pred_next_flow)
        flow_traj.append(out["flow_final"])
        flow_init = out["next_flow"]
        next_traj.append(flow_init)
        if (t_idx + 1) % yield_every == 0:
            flow_init = jax.lax.stop_gradient(flow_init)
            yield {"flow_final": out["flow_final"],
                   "flow_preds": flow_traj,
                   "flow_next_trajectory": next_traj}
            flow_traj, next_traj = [], []
