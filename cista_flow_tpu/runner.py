"""Shared evaluation runner: model build + checkpoint load + jitted step.

Backs the four eval CLIs (test_with_flow / test_wo_flow / test_noeval /
test_mvsec), mirroring the reference's Reconstructor classes
(ref: test_with_flow.py:24-88). One compiled step per model_mode; the host
loop streams numpy frames in and reconstructions out.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from .ckpt import torch_import as ti
from .models import composite


def model_name_from_cfg(cfgs) -> str:
    base = "{}_b{}_d{}_c{}".format(cfgs.model_mode, cfgs.num_bins,
                                   cfgs.depth, cfgs.base_channels)
    if cfgs.model_name:
        return f"{cfgs.model_name}_{base}"
    return base


class Reconstructor:
    """Streaming single-batch reconstructor with a compiled step."""

    def __init__(self, cfgs):
        self.cfgs = cfgs
        self.model_mode = cfgs.model_mode
        h, w = cfgs.image_dim
        self.image_dim = (h, w)

        # ---- load / init parameters ------------------------------------
        if cfgs.path_to_test_model:
            path = cfgs.path_to_test_model
            if cfgs.load_epoch_for_test:
                name = path.rstrip("/").split("/")[-1]
                path = os.path.join(
                    path, f"{name}_{cfgs.load_epoch_for_test}.pth.tar")
                self.model_name = f"{name}/{cfgs.load_epoch_for_test}"
            else:
                self.model_name = os.path.splitext(os.path.basename(path))[0]
            sd = ti.load_state_dict(path)
            self.params, self.model_state = ti.composite_params(
                sd, self.model_mode)
        else:
            self.model_name = model_name_from_cfg(cfgs)
            self.params, self.model_state = composite.init(
                jax.random.PRNGKey(cfgs.seed), cfgs)

        # optional CISTA-LSTC override (ref: test_with_flow.py:70-72)
        if cfgs.path_to_e2v:
            sd = ti.load_state_dict(cfgs.path_to_e2v)
            self.params["cista"] = ti.cista_lstc_params(sd)

        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree_util.tree_leaves(self.params))
        print(f"Total parameters: {n_params}")
        print(f"Estimated model memory size: {n_params * 4 / 1024 / 1024:.2f} MB")

        # bf16 serving mode (--dtype bfloat16): ~2x faster on TPU, PSNR
        # impact measured in tests/test_bf16_drift.py
        self.dtype = jnp.bfloat16 if cfgs.dtype == "bfloat16" else jnp.float32
        if self.dtype == jnp.bfloat16:
            self.params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, self.params)

        # multi-chip serving: --mesh_shape N --mesh_axes spatial shards the
        # streaming step's activations over H (single-stream latency
        # parallelism; XLA GSPMD inserts the conv halo exchanges). The
        # TPU-native upgrade of the reference's 2-GPU model split
        # (ref: e2v/e2v_model.py:312-346) on the serving side.
        self.mesh = None
        if str(cfgs.mesh_shape) != "1":
            from . import parallel
            self.mesh = parallel.mesh_from_config(cfgs)
            self.params = parallel.replicate_tree(self.params, self.mesh)
            self.model_state = parallel.replicate_tree(self.model_state,
                                                       self.mesh)

        self.iters = cfgs.default_flow_iters()
        self._step = self._build_step()
        self._window = self._build_window()
        self.reset()

    # ------------------------------------------------------------------
    def _build_step(self):
        cfg = self.cfgs
        mode = self.model_mode
        mesh = self.mesh

        def constrain(x):
            if mesh is None or "spatial" not in mesh.axis_names or x.ndim != 4:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, "spatial", None, None)))

        def step(params, mstate, state, events, rec_img0, extra, gt_flow,
                 use_gt_flow):
            events = constrain(events)
            rec_img0 = constrain(rec_img0)
            extra = constrain(extra)
            batch = {"event_voxel": events, "rec_img0": rec_img0}
            batch_gt = {}
            if use_gt_flow:
                batch_gt["gt_flow"] = gt_flow
            kwargs = {}
            if mode == "cista-eraft":
                batch["event_voxel_old"] = extra
            elif mode == "cista-idnet":
                kwargs["flow_init"] = extra
            rec, batch_flow, new_state, _ = composite.apply(
                params, mstate, batch, state, cfg, batch_gt=batch_gt,
                iters=self.iters, collect_preds=False, **kwargs)
            flow_final = batch_flow["flow_final"]
            next_extra = batch_flow.get("next_flow")
            return rec, flow_final, new_state, next_extra

        # two variants: with/without GT flow injection (static flag)
        jit = lambda use_gt: jax.jit(
            lambda p, ms, st, ev, r0, ex, gf: step(p, ms, st, ev, r0, ex, gf,
                                                   use_gt))
        return {True: jit(True), False: jit(False)}

    def _build_window(self):
        """Device-resident closed-loop recurrence over a whole event window:
        one ``lax.scan`` replaces T host round-trips (the reference's eval
        loop syncs every sub-frame, ref: test_with_flow.py:120-156; through
        this environment's tunnel each sync costs ~30 ms). Numerically
        identical to T sequential ``step`` calls
        (tests/test_step_window.py); jit re-specializes per window length."""
        cfg = self.cfgs
        mode = self.model_mode
        mesh = self.mesh

        def constrain(x):
            if mesh is None or "spatial" not in mesh.axis_names or x.ndim != 4:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, "spatial", None, None)))

        def window(params, mstate, state, rec0, extra, events_seq, gt_flows,
                   use_gt_flow):
            if mode == "cista-eraft" and not use_gt_flow:
                # time-parallel fast path: E-RAFT's flow depends only on
                # consecutive voxel pairs, so the whole window's flows run as
                # ONE batched flow-net call; only the cheap CISTA recurrence
                # stays sequential (composite.apply_sequence_eraft; parity
                # pinned in test_sequence_eraft / test_step_window)
                voxel_seq = jnp.concatenate(
                    [constrain(extra)[None], events_seq], axis=0)
                recs, flows, state = composite.apply_sequence_eraft(
                    params, mstate, voxel_seq, state, cfg, rec0=rec0,
                    iters=self.iters)
                return recs, flows, state, events_seq[-1]

            def body(carry, xs):
                state, rec0, extra = carry
                events, ev_s2d, gt_flow = xs
                events = constrain(events)
                rec0 = constrain(rec0)
                extra = constrain(extra)
                batch = {"event_voxel": events, "rec_img0": rec0,
                         "event_voxel_s2d": ev_s2d}
                batch_gt = {"gt_flow": gt_flow} if use_gt_flow else {}
                kwargs = {}
                if mode == "cista-eraft":
                    batch["event_voxel_old"] = extra
                elif mode == "cista-idnet":
                    kwargs["flow_init"] = extra
                rec, batch_flow, new_state, _ = composite.apply(
                    params, mstate, batch, state, cfg, batch_gt=batch_gt,
                    iters=self.iters, collect_preds=False, **kwargs)
                if mode == "cista-eraft":
                    new_extra = events
                elif mode == "cista-idnet":
                    new_extra = batch_flow["next_flow"]
                else:
                    new_extra = extra
                return ((new_state, rec, new_extra),
                        (rec, batch_flow["flow_final"]))
            # whole-window s2d pack of the voxels for the CISTA head (one
            # amortized transpose; DCE'd whenever the head's gate is off)
            from .ops import s2d as S2D
            if events_seq.shape[2] % 2 == 0 and events_seq.shape[3] % 2 == 0:
                ev_s2d = jax.vmap(S2D.space_to_depth)(events_seq)
            else:
                t_, b_, hh, ww, nb = events_seq.shape
                ev_s2d = jnp.zeros((t_, b_, hh // 2, ww // 2, 4 * nb),
                                   events_seq.dtype)
            (state, rec, extra), (recs, flows) = jax.lax.scan(
                body, (state, rec0, extra), (events_seq, ev_s2d, gt_flows))
            return recs, flows, state, extra

        jit = lambda use_gt: jax.jit(
            lambda p, ms, st, r0, ex, ev, gf: window(p, ms, st, r0, ex, ev,
                                                     gf, use_gt))
        return {True: jit(True), False: jit(False)}

    def reset(self):
        """New sequence: zero state, zero prev frame, clear chaining."""
        h, w = self.image_dim
        dt = self.dtype
        self.state = jax.tree_util.tree_map(
            lambda x: x.astype(dt), composite.zero_state(1, self.cfgs))
        self.prev_image = jnp.zeros((1, h, w, 1), dt)
        hp = (h + 31) // 32 * 32
        wp = (w + 31) // 32 * 32
        if self.model_mode == "cista-eraft":
            self.extra = jnp.zeros((1, h, w, self.cfgs.num_bins), dt)
        elif self.model_mode == "cista-idnet":
            # next_flow chaining lives at padded resolution (ref: idedeq.py)
            self.extra = jnp.zeros((1, hp, wp, 2), dt)
        else:
            self.extra = jnp.zeros((1,), dt)  # unused placeholder

    def step(self, voxel_chw: np.ndarray, gt_flow_chw: np.ndarray | None = None,
             use_gt_flow: bool = False):
        """One reconstruction. voxel: (C,H,W) numpy; gt_flow: (2,H,W) or None.
        Returns (rec (H,W) np.float32, flow_final (2,H,W) np.float32)."""
        h, w = self.image_dim
        events = jnp.asarray(voxel_chw.transpose(1, 2, 0), self.dtype)[None]
        if gt_flow_chw is None:
            gt_flow = jnp.zeros((1, h, w, 2), jnp.float32)
        else:
            gt_flow = jnp.asarray(gt_flow_chw.transpose(1, 2, 0),
                                  jnp.float32)[None]

        rec, flow_final, self.state, next_extra = self._step[bool(use_gt_flow)](
            self.params, self.model_state, self.state, events,
            self.prev_image, self.extra, gt_flow)
        self.prev_image = rec
        if self.model_mode == "cista-eraft":
            self.extra = events
        elif self.model_mode == "cista-idnet" and next_extra is not None:
            self.extra = next_extra
        rec_np = np.asarray(rec.astype(jnp.float32))[0, :, :, 0]
        flow_np = np.asarray(flow_final.astype(jnp.float32))[0].transpose(2, 0, 1)
        return rec_np, flow_np

    def step_window(self, voxels_chw: list, gt_flows_chw: list | None = None,
                    use_gt_flow: bool = False, return_all: bool = False):
        """T reconstructions in one device dispatch (scan over the window).

        Equivalent to T sequential :meth:`step` calls but with a single host
        round-trip. Returns the FINAL step's (rec (H,W), flow (2,H,W)) — the
        only outputs the windowed eval loops consume (ref:
        test_with_flow.py:120-156 evaluates once per event window) — or, with
        ``return_all``, every step's (recs (T,H,W), flows (T,2,H,W)).
        """
        t = len(voxels_chw)
        if t == 0:
            raise ValueError("empty window")
        h, w = self.image_dim
        events = jnp.asarray(
            np.stack([v.transpose(1, 2, 0) for v in voxels_chw])[:, None],
            self.dtype)
        if gt_flows_chw is None:
            gt_flows = jnp.zeros((t, 1, h, w, 2), jnp.float32)
        else:
            gt_flows = jnp.asarray(
                np.stack([f.transpose(1, 2, 0) for f in gt_flows_chw])[:, None],
                jnp.float32)

        recs, flows, self.state, self.extra = \
            self._window[bool(use_gt_flow)](
                self.params, self.model_state, self.state, self.prev_image,
                self.extra, events, gt_flows)
        self.prev_image = recs[-1]
        recs_np = np.asarray(recs.astype(jnp.float32))[:, 0, :, :, 0]
        flows_np = np.asarray(flows.astype(jnp.float32))[:, 0].transpose(
            0, 3, 1, 2)
        if return_all:
            return recs_np, flows_np
        return recs_np[-1], flows_np[-1]


def discover_sequences(path_to_test_data: str) -> list[str]:
    """Sorted sequence sub-folders (ref: test_with_flow.py:39-43)."""
    out = [os.path.join(path_to_test_data, d)
           for d in os.listdir(path_to_test_data)
           if os.path.isdir(os.path.join(path_to_test_data, d))]
    return sorted(out)
