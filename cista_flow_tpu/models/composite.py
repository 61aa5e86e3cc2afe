"""Composite CISTA-Flow system models (NHWC, functional).

DCEIFlowCistaNet / ERAFTCistaNet / IDCistaNet equivalents
(ref: e2v/e2v_model.py:138-308): per step, estimate flow from events (+
previous reconstruction), warp the previous frame and the recurrent sparse
codes along it, then reconstruct with CISTA-LSTC.

Differences from the reference, by design:
* state is always explicit (zero-state constructors; no ``None`` branches)
* the data-dependent zero-flow short-circuit (ref: e2v_model.py:184-185)
  becomes a ``jnp.where`` on a scalar predicate — exact same numerics,
  jit-compatible
* ``fix_params`` (requires_grad mutation, ref: e2v_model.py:116-133) becomes
  ``stop_gradient`` on the frozen subtree + optimizer masking in train.py
* the 2-GPU model split (ref: e2v_model.py:312-346) is replaced by mesh
  sharding in cista_flow_tpu.parallel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.fastpath import tpu_bf16
from ..ops.resize import interpolate_scale
from ..ops.warp import frame_warp
from . import cista_lstc, dceiflow, eraft, idnet

FLOW_MODES = ("cista-eiflow", "cista-eraft", "cista-idnet")


def init(key, cfg):
    """Returns (params, model_state) for the full composite.

    params = {'cista': ..., 'flow': ...}; model_state holds flow-net BN stats.
    """
    k1, k2 = jax.random.split(key)
    params = {"cista": cista_lstc.init(k1, cfg)}
    model_state = {}
    if cfg.model_mode == "cista-eiflow":
        params["flow"], model_state["flow"] = dceiflow.init(k2, cfg)
    elif cfg.model_mode == "cista-eraft":
        params["flow"], model_state["flow"] = eraft.init(k2, cfg)
    elif cfg.model_mode == "cista-idnet":
        params["flow"] = idnet.init(k2, cfg)
        model_state["flow"] = {}
    elif cfg.model_mode in ("cista-lstc", "cista-gtflow"):
        params["flow"] = {}
        model_state["flow"] = {}
    else:
        raise ValueError(f"unknown model_mode {cfg.model_mode}")
    return params, model_state


def zero_state(batch: int, cfg) -> cista_lstc.CistaState:
    return cista_lstc.zero_state(batch, cfg.image_dim, cfg.base_channels)


def _maybe_freeze(tree, frozen: bool):
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree) if frozen else tree


def _warp_inputs(rec_img0, state, flow_final, cfg, half_flow=None):
    """Warp previous frame (full res) + sparse codes (half res) along flow;
    keep the reference's exact zero-flow short-circuit semantics.

    ``half_flow``: optionally precomputed (see _half_flow_composed — the
    eiflow serving path derives it from the 1/8-res flow with one composed
    constant-matrix pair instead of down-resizing the full-res map)."""
    warped_i = frame_warp(rec_img0, flow_final, mode=cfg.warp_mode)
    if half_flow is None:
        half_flow = interpolate_scale(flow_final, cfg.scale_factor,
                                      align_corners=True)
    warped_z = frame_warp(state.sparse_code, half_flow, mode=cfg.warp_mode)
    any_flow = jnp.any(flow_final != 0)
    warped_i = jnp.where(any_flow, warped_i, rec_img0)
    warped_z = jnp.where(any_flow, warped_z, state.sparse_code)
    return warped_i, state._replace(sparse_code=warped_z)


@functools.lru_cache(maxsize=16)
def _half_flow_mats(out_size, full_size, pad, padded_size, low_size, scale):
    """One composed (out, low) axis matrix for down2(unpad(upflow(f8)))."""
    import numpy as np
    from ..ops.resize import _interp_matrix_np
    m = _interp_matrix_np(out_size, full_size, True) @ (
        scale * _interp_matrix_np(padded_size, low_size, True)[pad:, :])
    return np.asarray(m, np.float32)


def _half_flow_composed(flow_lowres, cfg):
    """Half-res warp flow straight from the flow net's 1/8-res output.

    The model computes half_flow = downx2(unpad(upflow8(f8))) — a chain of
    constant linear maps per axis. Composing them into one (H/2, H/8pad)
    matrix pair turns two full-res einsums + a slice into two TINY
    contractions on the low-res flow. Exact up to float summation order
    (pinned vs the two-stage path in tests/test_composite.py). Only valid
    when the warp flow IS the net's upsampled flow (not gt_flow) —
    composite.apply gates accordingly. ref chain: DCEIFlow upflow8
    (sample_utils.py:61-78) -> unpad -> F.interpolate(scale=0.5)."""
    from ..ops.pad import ImagePadder

    h, w = cfg.image_dim
    _, h8, w8, _ = flow_lowres.shape
    padder = ImagePadder(cfg.image_dim, min_size=32)
    hp, wp = padder.padded_dim
    sc = float(hp // h8)  # upflow magnitude scale (== ds == 8), applied once
    mh = _half_flow_mats(int(h * cfg.scale_factor), h, padder.pad_height,
                         hp, h8, sc)
    mw = _half_flow_mats(int(w * cfg.scale_factor), w, padder.pad_width,
                         wp, w8, 1.0)
    f = flow_lowres.astype(jnp.float32)
    f = jnp.einsum("oh,bhwc->bowc", jnp.asarray(mh), f)
    f = jnp.einsum("ow,bhwc->bhoc", jnp.asarray(mw), f)
    return f.astype(flow_lowres.dtype)


def apply(params, model_state, batch_data, state, cfg, batch_gt=None,
          fix_net_name=None, train=False, iters=None, flow_init=None,
          collect_preds=True):
    """One reconstruction step.

    batch_data: dict with NHWC arrays — event_voxel (B,H,W,bins),
      rec_img0 (B,H,W,1); + event_voxel_old (eraft) / event_voxel_bw,
      flow_init (eiflow warm start).
    batch_gt: optional dict — gt_img0/gt_img1 (eiflow training),
      gt_flow (GT-flow training mode).
    Returns (I_rec, batch_flow, new_state, new_model_state).
    """
    batch_gt = batch_gt or {}
    iters = iters if iters is not None else cfg.default_flow_iters()
    events = batch_data["event_voxel"]
    rec_img0 = batch_data["rec_img0"]
    new_model_state = dict(model_state)

    # fix_params('rec') freezes the RECONSTRUCTION net and trains flow;
    # fix_params('flow') freezes the FLOW net (ref: e2v_model.py:116-133)
    flow_params = _maybe_freeze(params.get("flow", {}), fix_net_name == "flow")
    cista_params = _maybe_freeze(params["cista"], fix_net_name == "rec")

    # --- flow estimation ---------------------------------------------------
    half_flow_direct = None
    if cfg.model_mode == "cista-eiflow":
        image1 = batch_gt.get("gt_img0", rec_img0)
        if cfg.flow_half:
            # Flow net on the 2x-downsampled domain (gate-admitted serving
            # reduction; also usable in rec-only training phases, where no
            # flow-supervision loss consumes the half-domain flow_preds).
            # The flow net's own half-domain final flow IS the state-warp
            # flow (scale_factor 0.5), in the right pixel units; the frame
            # warp gets its x2 upsample with x2 magnitudes (flow-resize
            # convention, ref: e2v/e2v_model.py:190).
            import dataclasses as _dc
            assert batch_gt.get("gt_img1") is None and \
                batch_data.get("event_voxel_bw") is None, \
                "flow_half supports serving/rec-phase graphs only"
            h, w = cfg.image_dim
            hcfg = _dc.replace(cfg, image_dim=(h // 2, w // 2))
            ev_h = interpolate_scale(events, 0.5, align_corners=False)
            im_h = interpolate_scale(image1, 0.5, align_corners=False)
            batch_flow, new_model_state["flow"] = dceiflow.apply(
                flow_params, model_state["flow"], ev_h, im_h, hcfg,
                iters=iters, flow_init=batch_data.get("flow_init"),
                train=train and fix_net_name != "flow",
                collect_preds=collect_preds)
            batch_flow = dict(batch_flow)
            half_flow_direct = batch_flow["flow_final"]
            batch_flow["flow_final"] = 2.0 * interpolate_scale(
                half_flow_direct, 2.0, align_corners=True)
        else:
            batch_flow, new_model_state["flow"] = dceiflow.apply(
                flow_params, model_state["flow"], events, image1, cfg,
                image2=batch_gt.get("gt_img1"),
                reversed_event_voxel=batch_data.get("event_voxel_bw"),
                iters=iters, flow_init=batch_data.get("flow_init"),
                # flow-net BN mode mirrors fix_params: train() when the flow
                # net is the one being trained (fix='rec'), eval() when
                # frozen (fix='flow') — ref: e2v/e2v_model.py:122-129
                train=train and fix_net_name != "flow",
                collect_preds=collect_preds)
    elif cfg.model_mode == "cista-eraft":
        batch_flow, new_model_state["flow"] = eraft.apply(
            flow_params, model_state["flow"],
            batch_data["event_voxel_old"], events, cfg, iters=iters,
            # flow-net BN mode mirrors fix_params: train() when the flow net
            # is the one being trained (fix='rec'), eval() when frozen
            # (fix='flow') — ref: e2v/e2v_model.py:122-129
            train=train and fix_net_name != "flow",
            collect_preds=collect_preds)
    elif cfg.model_mode == "cista-idnet":
        batch_flow = idnet.apply(flow_params, events, cfg,
                                 flow_init=flow_init, deblur_iters=iters,
                                 collect_preds=collect_preds)
    else:  # cista-lstc / cista-gtflow: no flow net; GT flow or zero flow
        zero = jnp.zeros((*rec_img0.shape[:3], 2), rec_img0.dtype)
        batch_flow = {"flow_final": batch_gt.get("gt_flow", zero),
                      "flow_preds": []}

    flow_final = batch_flow["flow_final"]
    if fix_net_name == "flow":
        flow_final = jax.lax.stop_gradient(flow_final)
    if "gt_flow" in batch_gt:
        flow_final = batch_gt["gt_flow"]

    # --- warp + reconstruct --------------------------------------------------
    half_flow = None
    if (half_flow_direct is not None and "gt_flow" not in batch_gt
            and cfg.scale_factor == 0.5):
        half_flow = half_flow_direct
        if fix_net_name == "flow":
            half_flow = jax.lax.stop_gradient(half_flow)
    elif (cfg.model_mode == "cista-eiflow" and "gt_flow" not in batch_gt
            and cfg.scale_factor == 0.5 and "flow_init" in batch_flow):
        f8 = batch_flow["flow_init"]
        if fix_net_name == "flow":
            f8 = jax.lax.stop_gradient(f8)
        half_flow = _half_flow_composed(f8, cfg)
    warped_i, state = _warp_inputs(rec_img0, state, flow_final, cfg,
                                   half_flow=half_flow)
    i_rec, new_state = cista_lstc.apply(
        cista_params, events, warped_i, state, depth=cfg.depth,
        events_s2d=batch_data.get("event_voxel_s2d"))
    return i_rec, batch_flow, new_state, new_model_state


def apply_sequence_eraft(params, model_state, voxel_seq, state, cfg,
                         rec0=None, iters=None):
    """Time-parallel serving for cista-eraft.

    TPU-first restructuring impossible in the reference's eager loop: the
    E-RAFT flow depends ONLY on consecutive voxel pairs (ref:
    e2v_model.py:225), never on the reconstruction, so the whole chunk's
    flows run as ONE batched flow-net call (T folded into the batch) at high
    MXU utilization; only the cheap CISTA recurrence stays sequential
    (lax.scan). Numerically identical to stepping composite.apply
    (tests/test_sequence_eraft.py). Measured on v5e (bf16, 180x240): ~5%
    end-to-end over the stepwise scan at B=1-8 — the serial CISTA recurrence
    dominates; the bigger win is expected when the flow net grows relative
    to CISTA (more GRU iterations / higher resolution).

    voxel_seq: (T+1, B, H, W, bins) — voxel_seq[t], voxel_seq[t+1] feed step t
    (voxel_seq[0] is the 'old' voxel of the first step, zeros at stream start).
    Returns (recs (T, B, H, W, 1), flows (T, B, H, W, 2), state).
    """
    iters = iters if iters is not None else cfg.default_flow_iters()
    t_plus1, b = voxel_seq.shape[:2]
    t_len = t_plus1 - 1
    old = voxel_seq[:-1].reshape(t_len * b, *voxel_seq.shape[2:])
    new = voxel_seq[1:].reshape(t_len * b, *voxel_seq.shape[2:])

    # each voxel's fnet features are computed ONCE for the window
    # (fnet(old_t) == fnet(new_{t-1}); the stepwise path encodes every
    # interior voxel twice). Exact per-sample math, backend-independent —
    # always on, and covered directly by the CPU seq-vs-stepwise parity
    # test. The fnet+cnet block-diagonal pair tower measured NEGATIVE at
    # window batch (PERF.md "ERAFT serving") — CISTA_ERAFT_PAIR=1 opt-in.
    from ..nn import encoders as E
    from ..ops.pad import ImagePadder
    padder = ImagePadder(cfg.image_dim, min_size=32)
    fp, cp = params["flow"]["fnet"], params["flow"]["cnet"]
    cst = model_state["flow"]["cnet"]
    all_pad = padder.pad(
        voxel_seq.reshape(t_plus1 * b, *voxel_seq.shape[2:]))
    new_pad = padder.pad(new)
    if getattr(cfg, "eraft_pair_tower", False) and tpu_bf16(voxel_seq):
        fmap_first, _ = E.basic_encoder(
            fp, model_state["flow"]["fnet"], padder.pad(voxel_seq[0]),
            "instance", train=False)
        fmap_new, cnet_new = E.basic_encoder_multi(
            [fp], cp, cst, [new_pad, new_pad])
        fshape = fmap_new.shape[1:]
        fmap_seq = jnp.concatenate(
            [fmap_first[None], fmap_new.reshape(t_len, b, *fshape)],
            axis=0)
        fmap1 = fmap_seq[:-1].reshape(t_len * b, *fshape)
    else:
        fmap_all, _ = E.basic_encoder(
            fp, model_state["flow"]["fnet"], all_pad, "instance",
            train=False)
        fshape = fmap_all.shape[1:]
        fmap_seq = fmap_all.reshape(t_plus1, b, *fshape)
        fmap1 = fmap_seq[:-1].reshape(t_len * b, *fshape)
        fmap_new = fmap_seq[1:].reshape(t_len * b, *fshape)
        cnet_new, _ = E.basic_encoder(cp, cst, new_pad, "batch",
                                      train=False)
    encoded = (fmap1, fmap_new, cnet_new)

    # Time-subchunked flow net (cfg.eraft_tchunk=k / --eraft_tchunk):
    # identical per-sample math, but the GRU+corr stage runs as a lax.scan
    # over t_len/k groups of k*b samples instead of one t_len*b mega-batch.
    # Cuts the compiled graph (the 160-step window's single-batch flow call
    # measured a 34 MB executable / ~3.5 min cold compile through the
    # remote-compile tunnel) and the peak corr-volume footprint (one
    # (k*b, HW, H*W) pyramid live at a time instead of (t_len*b, ...)), at
    # the cost of serializing the groups. Exactness pinned by
    # tests/test_sequence_eraft.py.
    tchunk = int(getattr(cfg, "eraft_tchunk", 0) or 0)
    if tchunk and not (0 < tchunk < t_len and t_len % tchunk == 0):
        # the knob exists to bound the mega-batch flow call — silently
        # falling back would reintroduce exactly what it guards against
        import warnings
        warnings.warn(
            f"eraft_tchunk={tchunk} does not divide the window t_len="
            f"{t_len}; falling back to the single mega-batch flow call")
    if 0 < tchunk < t_len and t_len % tchunk == 0:
        g = t_len // tchunk

        def _grp(x):
            return x.reshape(g, tchunk * b, *x.shape[1:])

        def flow_body(_, xs):
            o, n, f1, fn, cn = xs
            bf, _unused = eraft.apply(
                params["flow"], model_state["flow"], o, n, cfg, iters=iters,
                collect_preds=False, encoded=(f1, fn, cn))
            return None, bf["flow_final"]

        _, flows_g = jax.lax.scan(
            flow_body, None,
            (_grp(old), _grp(new), _grp(fmap1), _grp(fmap_new),
             _grp(cnet_new)))
        flows = flows_g.reshape(t_len, b, *flows_g.shape[2:])
    else:
        batch_flow, _ = eraft.apply(params["flow"], model_state["flow"],
                                    old, new, cfg, iters=iters,
                                    collect_preds=False, encoded=encoded)
        flows = batch_flow["flow_final"].reshape(
            t_len, b, *batch_flow["flow_final"].shape[1:])

    if rec0 is None:
        h, w = cfg.image_dim
        rec0 = jnp.zeros((b, h, w, 1), voxel_seq.dtype)

    def body(carry, xs):
        rec_prev, st = carry
        events, ev_s2d, flow = xs
        warped_i, st = _warp_inputs(rec_prev, st, flow, cfg)
        rec, st = cista_lstc.apply(params["cista"], events, warped_i, st,
                                   depth=cfg.depth, events_s2d=ev_s2d)
        return (rec, st), rec

    # pack the whole window's voxels for the CISTA head in ONE amortized
    # transpose instead of one per scan step (ops/s2d.py)
    from ..ops import s2d as S2D
    ev = voxel_seq[1:]
    ev_s2d = jax.vmap(S2D.space_to_depth)(ev) \
        if ev.shape[2] % 2 == 0 and ev.shape[3] % 2 == 0 else \
        jnp.zeros((ev.shape[0], ev.shape[1], ev.shape[2] // 2,
                   ev.shape[3] // 2, 4 * ev.shape[4]), ev.dtype)
    (rec, state), recs = jax.lax.scan(body, (rec0, state),
                                      (ev, ev_s2d, flows))
    return recs, flows, state
