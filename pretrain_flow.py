"""Flow-net pretraining on FlyingChairs2 (DCEIFlow "GT I" stage, or RAFT).

The reference vendors the FlyingChairs2 dataset, augmentors, and the RAFT
sequence loss for this stage but ships no runnable script (the trained
checkpoint comes from the upstream DCEIFlow repo). This CLI completes the
pipeline natively: gamma-weighted sequence flow loss + x10 pseudo-feature
loss (ref: DCEIFlow/core/loss/L1Loss.py:6-114), optional bidirectional
branch, BN in train mode, checkpoints saved in the flow-net '.pth.tar'
layout ({'model': state_dict}) that both this framework and the upstream
loader (ref: DCEIFlow/DCEIFlow.py:120-140) accept.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import optax

from cista_flow_tpu import configs, parallel
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.data import FlyingChairs2
from cista_flow_tpu.losses.flow import flow_sequence_loss
from cista_flow_tpu.models import dceiflow, eraft, raft
from cista_flow_tpu.utils.profiling import StepTimer


def _to_nhwc(a):
    return np.transpose(a, (1, 2, 0)) if a.ndim == 3 else a[..., None]


def make_batches(ds, batch_size, shuffle, rng):
    order = np.arange(len(ds))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        items = [ds[j] for j in order[i:i + batch_size]]
        out = {}
        for k in items[0]:
            out[k] = np.stack([_to_nhwc(np.asarray(it[k], np.float32))
                               for it in items])
        yield out


def make_raft_optimizer(peak_lr: float, total_steps: int,
                        wdecay: float = 1e-4, clip: float = 1.0):
    """The upstream RAFT/DCEIFlow PRETRAINING recipe: AdamW + OneCycle LR +
    global-norm gradient clipping. (The composite trainer keeps the
    reference's plain Adam — ref: train.py:92-95 — whose trajectory is
    pinned vs torch; this optimizer exists only for the flow-supervision
    stage, where the upstream repos clip at 1.0 and anneal with OneCycle —
    RAFT train.py fetch_optimizer / DCEIFlow training recipe.)"""
    import optax

    # tiny smoke runs make the piecewise schedule degenerate: with
    # transition_steps small enough that a segment's knots collide
    # (e.g. 10 at pct_start=0.05), optax emits NaN LR from step 0.
    # Clamp ONLY the degenerate regime (warmup segment < 1 step) so a
    # genuine short run (20-99 steps) still completes its full decay
    # instead of silently ending mid-warmup on a stretched horizon.
    horizon = total_steps
    if int(0.05 * horizon) < 1:
        horizon = 100
        if total_steps > 1:  # not a 1-step compile smoke
            print(f"pretrain_flow: total_steps={total_steps} degenerate for "
                  f"OneCycle (warmup<1 step); stretching horizon to 100 — "
                  f"the run ends mid-schedule (smoke-run regime)")
    sched = optax.linear_onecycle_schedule(
        transition_steps=horizon, peak_value=peak_lr,
        pct_start=0.05, pct_final=1.0, div_factor=25.0,
        final_div_factor=1e3)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(learning_rate=sched, weight_decay=wdecay, eps=1e-8))


def make_train_step(cfg, opt, is_bi, flow_arch="dceiflow"):
    bf16 = getattr(cfg, "dtype", "float32") == "bfloat16"

    def loss_fn(params, state, batch):
        if bf16:
            # mixed precision, matching parallel/train_step.py: f32 master
            # weights, bf16 compute for the net inputs/params; supervision
            # targets stay f32
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            batch = dict(batch)
            for k in ("event_voxel", "event_voxel_bw", "event_voxel_old",
                      "gt_img0", "gt_img1"):
                if k in batch:
                    batch[k] = batch[k].astype(jnp.bfloat16)
        if flow_arch == "raft":
            # image-pair RAFT: RGB in [0, 255] (normalized inside the model)
            out, new_state = raft.apply(
                params, state, 255.0 * batch["gt_img0"],
                255.0 * batch["gt_img1"], cfg,
                iters=cfg.default_flow_iters(), train=True)
        elif flow_arch == "eraft":
            # events-only flow over consecutive voxel pairs (ref:
            # ERAFT/eraft.py:114 — fnet on both voxels, cnet on the newer)
            out, new_state = eraft.apply(
                params, state, batch["event_voxel_old"],
                batch["event_voxel"], cfg,
                iters=cfg.default_flow_iters(), train=True)
        else:
            out, new_state = dceiflow.apply(
                params, state, batch["event_voxel"],
                batch["gt_img0"][..., :1], cfg,
                image2=batch["gt_img1"][..., :1],
                reversed_event_voxel=batch.get("event_voxel_bw"),
                iters=cfg.default_flow_iters(), train=True)
        target = {"gt_img0": batch["gt_img0"][..., :1],
                  "gt_img1": batch["gt_img1"][..., :1],
                  "gt_flow": batch["gt_flow"],
                  "valid": batch["valid"]}
        if is_bi:
            target["gt_flow_bw"] = batch["gt_flow_bw"]
            target["valid_bw"] = batch["valid"]
        loss, metrics = flow_sequence_loss(out, target, cfg, is_bi=is_bi)
        return loss, (new_state, metrics["epe"])

    @jax.jit
    def step(params, state, opt_state, batch):
        (loss, (new_state, epe)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, epe

    return step


def main(cfgs):
    if getattr(cfgs, "data_kind", "chairs2") == "sim":
        # in-repo physics (cista_flow_tpu/data/sim.py): same supervision
        # schema as chairs2, with the composite train path's voxelization
        from cista_flow_tpu.data.sim import SimFlowPairs
        # aug=True: flip augmentation on, matching the chairs2 path's
        # do_flip default (and sim_flow_quality.py's training call)
        ds = SimFlowPairs(cfgs, aug=True)
        print(f"SimFlowPairs: {len(ds)} training pairs")
    else:
        ds = FlyingChairs2(cfgs, cfgs.path_to_train_data, data_kind="train",
                           aug_params={"crop_size": tuple(cfgs.image_dim),
                                       "do_flip": True})
        print(f"FlyingChairs2: {len(ds)} training samples")

    arch = getattr(cfgs, "flow_arch", "dceiflow")
    if arch == "raft":
        # keep the model and loss padders both no-ops (raft pads /8, the
        # sequence loss pads /32)
        assert cfgs.image_dim[0] % 32 == 0 and cfgs.image_dim[1] % 32 == 0, \
            "raft pretraining needs a /32-divisible crop"
        params, state = raft.init(jax.random.PRNGKey(cfgs.seed), cfgs)
    elif arch == "eraft":
        params, state = eraft.init(jax.random.PRNGKey(cfgs.seed), cfgs)
    else:
        params, state = dceiflow.init(jax.random.PRNGKey(cfgs.seed), cfgs)
    if getattr(cfgs, "opt", "adam") == "raft":
        steps_per_epoch = max(1, len(ds) // cfgs.batch_size)
        opt = make_raft_optimizer(cfgs.lr, cfgs.epochs * steps_per_epoch)
    else:
        opt = parallel.make_optimizer(cfgs.lr)
    opt_state = opt.init(params)
    step = make_train_step(cfgs, opt, cfgs.is_bi and arch == "dceiflow", arch)
    rng = np.random.default_rng(cfgs.seed)

    out_dir = os.path.join(cfgs.path_to_model,
                           f"{arch}_b{cfgs.num_bins}")
    os.makedirs(out_dir, exist_ok=True)

    for epoch in range(cfgs.epochs):
        timer = StepTimer(f"epoch{epoch + 1}")
        for i, batch in enumerate(make_batches(ds, cfgs.batch_size,
                                               cfgs.shuffle, rng)):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            timer.start()
            params, state, opt_state, loss, epe = step(params, state,
                                                       opt_state, jb)
            timer.stop(loss)
            if i % 50 == 0:
                print(f"Epoch {epoch + 1} [{i * cfgs.batch_size}/{len(ds)}] "
                      f"loss: {float(loss):.4f} epe: {float(epe):.3f}")
        print(timer)

        import torch

        export = {"raft": ti.raft_export,
                  "eraft": ti.eraft_export}.get(arch, ti.dceiflow_export)
        sd = export(jax.device_get(params), jax.device_get(state))
        sd = {k: torch.from_numpy(np.array(v))
              for k, v in sd.items()}
        path = os.path.join(out_dir, f"{arch}_{epoch + 1}.pth.tar")
        torch.save({"epoch": epoch, "model": sd}, path)
        print(f"saved {path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Flow-net pretraining")
    configs.add_args(parser)
    parser.add_argument("--flow_arch", default="dceiflow",
                        choices=["dceiflow", "raft", "eraft"])
    parser.add_argument("--opt", default="adam", choices=["adam", "raft"],
                        help="raft: AdamW + OneCycle + clip(1.0), the "
                             "upstream RAFT/DCEIFlow pretraining recipe")
    parser.add_argument("--data_kind", default="chairs2",
                        choices=["chairs2", "sim"])
    args = parser.parse_args()
    cfgs = configs.from_args(args)
    # model_mode drives the sim dataset's per-item keys (cista-eraft emits
    # the event_voxel_old pair member) and default_flow_iters (6 vs 12)
    cfgs.model_mode = ("cista-eraft" if args.flow_arch == "eraft"
                       else "cista-eiflow")
    cfgs.flow_arch = args.flow_arch
    cfgs.data_kind = args.data_kind
    cfgs.opt = args.opt
    if args.flow_arch == "eraft" and args.data_kind != "sim":
        parser.error("--flow_arch eraft needs --data_kind sim "
                     "(chairs2 has no event stream for the voxel pair)")
    main(cfgs)
