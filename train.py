"""CISTA-Flow trainer: three-phase alternating schedule, BPTT over sequences.

Equivalent of the reference trainer (ref: train.py:27-269), TPU-native:
* one compiled train step per phase (lax.scan BPTT over ``len_sequence``)
* data-parallel batch sharding over a device mesh (``--mesh_shape``),
  replacing the reference's optional 2-GPU model split
* phase schedule (ref: train.py:116-129):
    [0, flow_epoch)                 train flow, freeze rec, GT flow to CISTA
    [flow_epoch, +rec_epoch)        train rec, freeze flow (pred flow)
    beyond: lr := 3e-5, alternate every 2 epochs (mod-4)
* Adam + StepLR(10, 0.9); resume rescales lr by 0.9^floor(epoch/10)
  (optimizer moments are not checkpointed, like the reference)
* checkpoints saved in the reference's .pth.tar layout (torch-loadable) at
  the reference's schedule (ref: train.py:137-140).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from cista_flow_tpu import configs, parallel
from cista_flow_tpu.ckpt import orbax_io, torch_import as ti
from cista_flow_tpu.utils.profiling import StepTimer
from cista_flow_tpu.data import (StackedSequenceLoader, TrainSequenceDataset,
                                 device_prefetch)
from cista_flow_tpu.models import composite
from cista_flow_tpu.runner import model_name_from_cfg


def phase_for_epoch(cfgs, epoch: int):
    """Returns (fix_net_name, loss_mode, use_gt_flow, lr_override)."""
    if cfgs.model_mode in ("cista-lstc", "cista-gtflow"):
        # CISTA (GT Flow) pretraining — the reference defers this stage to the
        # external CISTA repo; supported natively here: no flow net, GT flow
        # drives the warps, reconstruction loss only.
        return None, "rec", True, None
    if epoch < cfgs.flow_epoch:
        return "rec", "flow", True, None
    if epoch < cfgs.flow_epoch + cfgs.rec_epoch:
        return "flow", "rec", False, None
    # phase-3 alternation (ref: train.py:123-129,210-217): the train-rec
    # half uses loss_mode='rec' (with the s>=2 consistency term); the
    # train-flow half uses 'both' with the consistency term OFF.
    if (epoch - cfgs.flow_epoch - cfgs.rec_epoch) % 4 >= 2:
        return "flow", "rec", False, 3e-5
    return "rec", "both", False, 3e-5


class Trainer:
    def __init__(self, cfgs):
        self.cfgs = cfgs
        self.model_name = model_name_from_cfg(cfgs)
        self.path_to_model = os.path.join(cfgs.path_to_model, self.model_name)
        os.makedirs(self.path_to_model, exist_ok=True)

        # ---- params / checkpoints (ref: train.py:57-79) -----------------
        # load_epoch_for_train == -1: exact resume from the latest orbax
        # checkpoint (params + BN state + optimizer moments + epoch — a
        # capability the reference lacks: it reloads weights only)
        self._orbax_resume = None  # (directory, step) when resuming
        self._resume_global_step = 0
        orbax_dir = os.path.join(self.path_to_model, "orbax")
        steps_dir = os.path.join(self.path_to_model, "orbax_steps")
        if cfgs.load_epoch_for_train == -1:
            self.params, self.model_state = composite.init(
                jax.random.PRNGKey(cfgs.seed), cfgs)
            e_step = orbax_io.latest_step(orbax_dir)
            s_step = orbax_io.latest_step(steps_dir)
            if s_step is not None:
                # mid-epoch preemption save: prefer it when it is newer than
                # the last completed-epoch save; that epoch restarts from the
                # top (its first batches replay — documented, standard
                # preemption-recovery semantics)
                meta = orbax_io.read_meta(steps_dir, s_step) or {}
                if e_step is None or meta.get("epoch", -1) >= e_step:
                    self._orbax_resume = (steps_dir, s_step)
                    self._resume_global_step = meta.get("global_step", 0)
                    cfgs.load_epoch_for_train = meta.get("epoch", 0)
            if self._orbax_resume is None:
                assert e_step is not None, f"no orbax checkpoint in {orbax_dir}"
                self._orbax_resume = (orbax_dir, e_step)
                cfgs.load_epoch_for_train = e_step
        elif cfgs.load_epoch_for_train:
            path = os.path.join(
                self.path_to_model,
                f"{self.model_name}_{cfgs.load_epoch_for_train}.pth.tar")
            sd = ti.load_state_dict(path)
            self.params, self.model_state = ti.composite_params(
                sd, cfgs.model_mode)
        elif cfgs.path_to_e2vflow:
            sd = ti.load_state_dict(cfgs.path_to_e2vflow)
            self.params, self.model_state = ti.composite_params(
                sd, cfgs.model_mode)
            print(f"Load path_to_e2vflow: {cfgs.path_to_e2vflow}")
        else:
            self.params, self.model_state = composite.init(
                jax.random.PRNGKey(cfgs.seed), cfgs)
            if cfgs.path_to_e2v:
                self.params["cista"] = ti.cista_lstc_params(
                    ti.load_state_dict(cfgs.path_to_e2v))
                print(f"Load path_to_e2v: {cfgs.path_to_e2v}")
            if cfgs.path_to_flownet:
                sd = ti.load_state_dict(cfgs.path_to_flownet)
                if cfgs.model_mode == "cista-eiflow":
                    self.params["flow"], self.model_state["flow"] = \
                        ti.dceiflow_params(sd)
                elif cfgs.model_mode == "cista-eraft":
                    self.params["flow"], self.model_state["flow"] = \
                        ti.eraft_params(sd)
                elif cfgs.model_mode == "cista-idnet":
                    self.params["flow"] = ti.idnet_params(sd)
                print(f"Load path_to_flownet: {cfgs.path_to_flownet}")

        # ---- data --------------------------------------------------------
        ds = TrainSequenceDataset(
            os.path.join(cfgs.path_to_train_data, "train_e2v_estflow.txt"),
            cfgs)
        # multi-host: each process loads a disjoint subset; batch_size is the
        # PER-HOST batch (global batch = batch_size * process_count)
        self.loader = StackedSequenceLoader(
            ds, batch_size=cfgs.batch_size, len_sequence=max(cfgs.len_sequence, 1),
            shuffle=cfgs.shuffle, seed=cfgs.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count())

        # ---- mesh / optimizer --------------------------------------------
        # --distributed (the reference's 2-GPU split flag) maps to a
        # data-parallel mesh over all local devices
        if cfgs.distributed and cfgs.mesh_shape == "1":
            cfgs.mesh_shape = str(len(jax.devices()))
        self.mesh = parallel.mesh_from_config(cfgs) \
            if cfgs.mesh_shape != "1" else None
        lr = cfgs.lr * (0.9 ** np.floor(cfgs.load_epoch_for_train / 10.0))
        self.base_lr = cfgs.lr
        self.opt = parallel.make_optimizer(float(lr))
        self.opt_state = self.opt.init(self.params)
        if self._orbax_resume is not None:
            rdir, rstep = self._orbax_resume
            template = {"params": self.params, "model_state": self.model_state,
                        "opt_state": self.opt_state}
            if rdir.endswith("orbax_steps"):
                template["meta"] = {"epoch": np.asarray(0),
                                    "global_step": np.asarray(0)}
            restored, _ = orbax_io.restore_checkpoint(
                rdir, rstep, template=template)
            self.params = restored["params"]
            self.model_state = restored["model_state"]
            self.opt_state = restored["opt_state"]
            print(f"Resumed exactly from {os.path.basename(rdir)} "
                  f"step {rstep}")
        if self.mesh is not None:
            self.params = parallel.replicate_tree(self.params, self.mesh)
            self.model_state = parallel.replicate_tree(self.model_state, self.mesh)
            self.opt_state = parallel.replicate_tree(self.opt_state, self.mesh)

        # optional LPIPS for the training perceptual term (ref default:
        # net='alex', loss.py:307). Convert weights with convert_lpips.py.
        from cista_flow_tpu.losses import lpips as lpips_mod
        self.lpips_params = lpips_mod.params_from_env()
        if self.lpips_params is None:
            print("LPIPS weights not provided (set CISTA_LPIPS=<converted "
                  ".npz>; see convert_lpips.py); training without the "
                  "perceptual term.")

        self._steps = {}
        self.writer = None
        if cfgs.is_SummaryWriter:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.writer = SummaryWriter(f"./summary/{self.model_name}")
            except ImportError:
                print("tensorboard unavailable; scalar logging disabled")

    def _get_step(self, fix_net_name, loss_mode, use_gt_flow):
        key = (fix_net_name, loss_mode, use_gt_flow)
        if key not in self._steps:
            self._steps[key] = parallel.make_train_step(
                self.cfgs, self.opt, loss_mode, fix_net_name, use_gt_flow,
                lpips_params=self.lpips_params, mesh=self.mesh, donate=False,
                remat=self.cfgs.remat)
        return self._steps[key]

    def run(self):
        cfgs = self.cfgs
        global_step = self._resume_global_step
        for epoch in range(cfgs.load_epoch_for_train, cfgs.epochs):
            fix, loss_mode, use_gt_flow, lr_override = phase_for_epoch(cfgs, epoch)
            lr = lr_override if lr_override is not None else \
                parallel.step_lr(self.base_lr, epoch)
            self.opt_state = parallel.set_lr(self.opt_state, lr)
            print(f"lr: {lr}")
            print(f"train_rec: {fix == 'flow'}")

            step = self._get_step(fix, loss_mode, use_gt_flow)
            n = len(self.loader)
            timer = StepTimer(f"epoch{epoch + 1}", warmup=1)
            put = ((lambda b: parallel.shard_seq_batch(b, self.mesh))
                   if self.mesh is not None else
                   (lambda b: {k: jax.numpy.asarray(v) for k, v in b.items()}))
            for batch_idx, seq in enumerate(
                    device_prefetch(self.loader, size=2, put=put)):
                timer.start()
                self.params, self.model_state, self.opt_state, loss = step(
                    self.params, self.model_state, self.opt_state, seq)
                timer.stop(loss)
                if self.writer is not None:
                    self.writer.add_scalar("loss", float(loss), global_step)
                global_step += 1
                if cfgs.save_every_steps > 0 and \
                        global_step % cfgs.save_every_steps == 0:
                    # preemption-safe mid-epoch save (params + BN state +
                    # optimizer moments + position); resume restarts this
                    # epoch from these exact moments
                    orbax_io.save_checkpoint(
                        os.path.join(self.path_to_model, "orbax_steps"),
                        global_step, self.params, self.model_state,
                        self.opt_state, max_to_keep=2,
                        meta={"epoch": epoch, "global_step": global_step})
                if batch_idx % 50 == 0:
                    print(f"Train Epoch: {epoch + 1} "
                          f"[{batch_idx * cfgs.batch_size}/"
                          f"{n * cfgs.batch_size} "
                          f"({100.0 * batch_idx / max(n, 1):.0f}%)]\t"
                          f"loss: {float(loss):.6f}")

            # save schedule (ref: train.py:137-140)
            boundary = cfgs.flow_epoch + cfgs.rec_epoch
            if (epoch == 0 or (epoch + 1) == boundary
                    or ((epoch + 1) >= boundary and (epoch + 1 - boundary) % 2 == 0)
                    or (epoch + 1) % 10 == 0):
                path = os.path.join(
                    self.path_to_model,
                    f"{self.model_name}_{epoch + 1}.pth.tar")
                ti.save_torch_checkpoint(
                    path, jax.device_get(self.params),
                    jax.device_get(self.model_state),
                    cfgs.model_mode, epoch, depth=cfgs.depth)
                print(f"saved {path}")
                if cfgs.orbax_ckpt:
                    orbax_io.save_checkpoint(
                        os.path.join(self.path_to_model, "orbax"), epoch + 1,
                        self.params, self.model_state, self.opt_state)
            print(timer)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Training options")
    configs.add_args(parser)
    cfgs = configs.from_args(parser.parse_args())
    cfgs.shuffle = True
    Trainer(cfgs).run()
