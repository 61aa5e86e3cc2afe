"""Trained-trajectory equivalence vs the torch reference.

Trains the upstream ``DCEIFlowCistaNet`` (f32, CPU, fixed seed, exactly the
reference trainer's semantics — ref: train.py:106-240; run in a clean torch
subprocess, see ref_trajectory_runner.py) and this repo's compiled train
step on IDENTICAL simulated batches for several epochs crossing ALL THREE
phase boundaries (flow-train → rec-train → alternating), and asserts the
per-optimizer-step losses track and the final params agree.

This is the strongest end-to-end training-correctness evidence available
without the external datasets: it pins the full loss / schedule / freeze /
BPTT / Adam stack, including:
* torch Adam's per-param step counts under requires_grad freezing
  (``_adam_per_subtree`` in parallel/train_step.py)
* the phase-3 loss composition ('both' + no consistency on the flow half)
* BN train/eval mode flips through ``fix_params`` (ref: e2v_model.py:124,130)
* BPTT gradient flow through the closed reconstruction loop (rec feeds the
  next step's flow-net image1 WITHOUT detach — ref: train.py:199).

The reference loss stack runs with its real math: LPIPS is inert on both
sides (no weights in this image; the torch side gets a zero nn.Module
stand-in), and pytorch_msssim (absent) is substituted by a faithful torch
SSIM implementing the same algorithm the JAX side uses (gaussian 11/1.5,
valid padding — pinned to an independent numpy implementation in
test_losses.py::test_ssim_matches_independent_numpy).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from cista_flow_tpu import configs
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.data import StackedSequenceLoader, TrainSequenceDataset
from cista_flow_tpu.data import sim
from cista_flow_tpu.parallel import train_step as ts_mod
from ref_trajectory_runner import (BATCH, EPOCHS, FLOW_EPOCH, H, ITERS, LR,
                                   REC_EPOCH, T, W, load_batches,
                                   save_batches)

pytestmark = pytest.mark.slow


def _make_batches(tmpdir):
    """Identical data for both trainers: tiny sim dataset -> stacked
    (T, B, H, W, C) NHWC batches, deterministic order."""
    sim.write_train_dataset(tmpdir, 1, T * 2 + 1, H, W, seed=5)
    cfg = configs.Config(model_mode="cista-eiflow", image_dim=(H, W),
                         path_to_train_data=tmpdir)
    ds = TrainSequenceDataset(
        os.path.join(tmpdir, "train_e2v_estflow.txt"), cfg)
    loader = StackedSequenceLoader(ds, batch_size=BATCH, len_sequence=T,
                                   shuffle=False, num_workers=0)
    return list(loader)


def _run_jax(params, mstate, batches):
    """This repo's trainer: the real compiled train steps + phase driver
    (train.py phase_for_epoch / Trainer.run semantics)."""
    import train as train_cli

    # the 3 distinct phase graphs dominate this test's wall time on CPU;
    # cache them persistently so reruns (and CI re-entries) skip the compile
    cache_dir = os.environ.get("CISTA_TRAJ_CACHE",
                               "/tmp/cista_traj_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    cfg = configs.Config(model_mode="cista-eiflow", image_dim=(H, W),
                         flow_iters=ITERS, dtype="float32",
                         flow_epoch=FLOW_EPOCH, rec_epoch=REC_EPOCH,
                         epochs=EPOCHS, len_sequence=T, batch_size=BATCH,
                         lr=LR)
    opt = ts_mod.make_optimizer(LR)
    opt_state = opt.init(params)
    steps, losses = {}, []
    jb = [{k: jax.numpy.asarray(v) for k, v in b.items()} for b in batches]
    for epoch in range(EPOCHS):
        fix, loss_mode, use_gt, lr_override = train_cli.phase_for_epoch(
            cfg, epoch)
        lr = lr_override if lr_override is not None \
            else ts_mod.step_lr(LR, epoch)
        opt_state = ts_mod.set_lr(opt_state, lr)
        key = (fix, loss_mode, use_gt)
        if key not in steps:
            steps[key] = ts_mod.make_train_step(cfg, opt, loss_mode, fix,
                                                use_gt, donate=False)
        for b in jb:
            params, mstate, opt_state, loss = steps[key](
                params, mstate, opt_state, b)
            losses.append(float(loss))
    return losses, params


def test_trajectory_matches_reference(tmp_path):
    batches = _make_batches(str(tmp_path))
    assert len(batches) == 1, "expected 1 optimizer step per epoch"
    batches_npz = str(tmp_path / "batches.npz")
    ref_npz = str(tmp_path / "ref_out.npz")
    save_batches(batches, batches_npz)

    # torch reference in a clean subprocess (no JAX resident — torch CPU
    # backward segfaults with the XLA CPU runtime loaded in-process)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = ""
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "ref_trajectory_runner.py"), batches_npz, ref_npz],
        check=True, env=env, timeout=2400)
    ref = np.load(ref_npz)
    losses_t = np.asarray(ref["losses"])
    init_sd = {k[len("init__"):]: ref[k] for k in ref.files
               if k.startswith("init__")}
    final_sd = {k[len("final__"):]: ref[k] for k in ref.files
                if k.startswith("final__")}

    params, mstate = ti.composite_params(ti.from_torch(init_sd),
                                         "cista-eiflow")
    losses_j, params_j = _run_jax(params, mstate, load_batches(batches_npz))

    lj, lt = np.asarray(losses_j), losses_t
    rel = np.abs(lj - lt) / np.maximum(np.abs(lt), 1e-6)
    print("\nper-step losses (jax | torch | rel):")
    for i, (a, b, r) in enumerate(zip(lj, lt, rel)):
        print(f"  step {i:2d}: {a:12.6f} {b:12.6f} {r:9.2e}")

    # early steps: near-identical math; later steps: drift compounds through
    # the closed loop but must stay small over the 8 optimizer steps
    np.testing.assert_allclose(lj[:4], lt[:4], rtol=2e-4)
    np.testing.assert_allclose(lj, lt, rtol=2e-2)

    # final params agree
    sd_j, _ = ti.composite_params(ti.from_torch(final_sd), "cista-eiflow")
    flat_j = jax.tree_util.tree_leaves_with_path(params_j)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(sd_j))
    diffs = [float(np.max(np.abs(np.asarray(leaf)
                                 - np.asarray(flat_t[path]))))
             for path, leaf in flat_j]
    print(f"max param divergence after {len(lj)} steps: {max(diffs):.3e}")
    assert max(diffs) < 5e-3
