"""Fast-tier trajectory sentinel: 2 optimizer steps vs the torch reference.

A miniature of test_train_trajectory.py (the 8-step slow-tier test) that
still crosses the first phase boundary (flow-train -> rec-train), so an
optimizer / BN-mode / freeze-semantics regression is caught in the fast
tier instead of only by the multi-hour slow tier. Spec: 120x128 (the
smallest numerically-defined reference dims — see ref_trajectory_runner),
T=2 BPTT, batch 1, 1 GRU iteration, FLOW_EPOCH=1 REC_EPOCH=1 EPOCHS=2.

Ref semantics pinned: train.py:116-129 (phase schedule), 188-232 (BPTT
accumulation + Adam step), e2v/e2v_model.py:116-133 (fix_params freeze +
BN mode flips).
"""
import os
import subprocess
import sys

import numpy as np

import jax

from cista_flow_tpu import configs
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.data import StackedSequenceLoader, TrainSequenceDataset
from cista_flow_tpu.data import sim
from cista_flow_tpu.parallel import train_step as ts_mod
from ref_trajectory_runner import LR, load_batches, save_batches

H, W = 120, 128
T, BATCH, ITERS = 2, 1, 1
FLOW_EPOCH, REC_EPOCH, EPOCHS = 1, 1, 2

SPEC_ENV = {"TRAJ_H": str(H), "TRAJ_W": str(W), "TRAJ_T": str(T),
            "TRAJ_BATCH": str(BATCH), "TRAJ_ITERS": str(ITERS),
            "TRAJ_FLOW_EPOCH": str(FLOW_EPOCH),
            "TRAJ_REC_EPOCH": str(REC_EPOCH), "TRAJ_EPOCHS": str(EPOCHS)}


def _make_batches(tmpdir):
    sim.write_train_dataset(tmpdir, 1, T + 1, H, W, seed=5)
    cfg = configs.Config(model_mode="cista-eiflow", image_dim=(H, W),
                         path_to_train_data=tmpdir)
    ds = TrainSequenceDataset(
        os.path.join(tmpdir, "train_e2v_estflow.txt"), cfg)
    loader = StackedSequenceLoader(ds, batch_size=BATCH, len_sequence=T,
                                   shuffle=False, num_workers=0)
    return list(loader)


def _run_jax(params, mstate, batches):
    import train as train_cli

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
    losses = []
    jb = [{k: jax.numpy.asarray(v) for k, v in b.items()} for b in batches]
    steps = {}
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


def test_two_step_trajectory_matches_reference(tmp_path):
    batches = _make_batches(str(tmp_path))
    assert len(batches) == 1, "expected 1 optimizer step per epoch"
    batches_npz = str(tmp_path / "batches.npz")
    ref_npz = str(tmp_path / "ref_out.npz")
    save_batches(batches, batches_npz)

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = ""
    env.update(SPEC_ENV)
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "ref_trajectory_runner.py"), batches_npz, ref_npz],
        check=True, env=env, timeout=900)
    ref = np.load(ref_npz)
    losses_t = np.asarray(ref["losses"])
    init_sd = {k[len("init__"):]: ref[k] for k in ref.files
               if k.startswith("init__")}
    final_sd = {k[len("final__"):]: ref[k] for k in ref.files
                if k.startswith("final__")}

    params, mstate = ti.composite_params(ti.from_torch(init_sd),
                                         "cista-eiflow")
    losses_j, params_j = _run_jax(params, mstate, load_batches(batches_npz))

    # 2 steps: near-identical math, no compounding window yet
    np.testing.assert_allclose(np.asarray(losses_j), losses_t, rtol=2e-4)

    # Param check. Each subtree takes exactly ONE Adam step here, and a
    # first Adam step with a mathematically-zero gradient — conv biases
    # feeding instance/batch norm (the norm removes any mean shift), e.g.
    # flow.fnet.*.b — is lr·g/(|g|+eps) with |g| pure round-off ~ eps:
    # torch-vs-jax diffs on those leaves are legitimately anywhere in
    # (0, 2·lr). Conv WEIGHTS always carry real gradients, and every
    # regression this sentinel hunts (wrong freeze, wrong per-subtree
    # step count, wrong moments/LR, BN-mode flip) moves weights and
    # biases of the affected subtree alike — so gate the per-leaf
    # diverged-element fraction on multi-dim leaves only (noise ~0% ≪
    # regression ~100%), with a loose global max over everything
    # (zero-grad bias noise is bounded by 2·lr = 2e-4 < 5e-4).
    sd_j, _ = ti.composite_params(ti.from_torch(final_sd), "cista-eiflow")
    flat_t = dict(jax.tree_util.tree_leaves_with_path(sd_j))
    worst, worst_frac, worst_leaf = 0.0, 0.0, None
    for path, leaf in jax.tree_util.tree_leaves_with_path(params_j):
        d = np.abs(np.asarray(leaf) - np.asarray(flat_t[path]))
        worst = max(worst, float(d.max()))
        if d.ndim < 2:    # biases/norm affines: zero-grad Adam noise
            continue      # (weights of the same layers cover them)
        frac = float(np.mean(d > 1.5e-4))
        if frac > worst_frac:
            worst_frac, worst_leaf = frac, jax.tree_util.keystr(path)
    assert worst < 5e-4, f"params diverged: {worst:.3e}"
    assert worst_frac < 0.10, \
        (f"{worst_frac:.1%} of {worst_leaf} diverged >1.5e-4 "
         f"(leaf-scale drift — wrong freeze/step-count/moments)")
