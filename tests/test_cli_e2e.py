"""End-to-end CLI smoke tests on synthetic data (tiny shapes, CPU) +
checkpoint round-trips against the upstream torch model."""
import os
import sys

import numpy as np
import pytest

import jax

from conftest import REPO_ROOT, add_reference_to_path
from cista_flow_tpu.configs import Config
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.models import composite
from test_data_pipeline import H, W, make_sequence_folder, make_train_txt

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)

cv2 = pytest.importorskip("cv2")


def test_checkpoint_roundtrip_loadable_by_reference(tmp_path):
    """Our exported .pth.tar must load into the upstream torch model with
    strict=True, and re-importing must reproduce our params exactly."""
    add_reference_to_path()
    import torch
    from e2v.e2v_model import ERAFTCistaNet

    cfg = Config(image_dim=(H, W), model_mode="cista-eraft")
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt.pth.tar")
    ti.save_torch_checkpoint(path, params, mstate, "cista-eraft", epoch=3,
                             depth=cfg.depth)

    class RefCfg:
        image_dim = (H, W)
        num_bins = 5
        depth = 5
        base_channels = 64
        ds = 8
        is_bi = False
        warp_mode = "forward"

    ref = ERAFTCistaNet(RefCfg())
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3
    ref.load_state_dict(ckpt["state_dict"], strict=True)

    p2, s2 = ti.composite_params(ti.load_state_dict(path), "cista-eraft")

    def by_path(tree):
        return {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(tree)}

    a_map, b_map = by_path(params), by_path(p2)
    assert set(a_map) == set(b_map)
    for k in a_map:
        np.testing.assert_allclose(np.asarray(a_map[k]), np.asarray(b_map[k]),
                                    err_msg=k)


def test_eval_cli_with_flow(tmp_path, capsys):
    from test_with_flow import evaluate_sequences

    root = tmp_path / "data" / "seq0"
    make_sequence_folder(str(root), n_frames=8)
    cfg = Config(image_dim=(H, W), model_mode="cista-eraft",
                 path_to_test_data=str(tmp_path / "data"),
                 output_folder=str(tmp_path / "out"),
                 test_data_mode="upsampled", flow_iters=1,
                 is_write_flow=True)
    results, keys = evaluate_sequences(cfg)
    out = capsys.readouterr().out
    assert "Average results" in out
    assert results[-1][0] == "mean"
    # artifacts written
    found_pngs = []
    for r, _, files in os.walk(str(tmp_path / "out")):
        found_pngs += [f for f in files if f.endswith(".png")]
    assert any(f.startswith("frame_") for f in found_pngs)
    assert any(f.startswith("flow_") for f in found_pngs)
    csvs = [f for r, _, files in os.walk(str(tmp_path / "out"))
            for f in files if f.endswith(".csv")]
    assert "result.csv" in csvs and "all.csv" in csvs


def test_eval_cli_wo_flow(tmp_path):
    from test_wo_flow import evaluate_sequences

    root = tmp_path / "data" / "seq0"
    make_sequence_folder(str(root), n_frames=8, n_events=500)
    cfg = Config(image_dim=(H, W), model_mode="cista-idnet",
                 path_to_test_data=str(tmp_path / "data"),
                 output_folder=str(tmp_path / "out"),
                 test_data_mode="real", num_events=800,
                 dataset="ECD", flow_iters=1)
    results, keys = evaluate_sequences(cfg)
    assert results[-1][0] == "mean"
    # FWL present in metrics row (last metric before N_frames)
    assert keys[-1] == "FWL" and len(results[0]) >= 5


def test_eval_harness_quality_gate(tmp_path):
    """--save_targets then re-run gates PASS; perturbed target gates FAIL."""
    import json

    import eval_harness

    root = tmp_path / "data" / "seq0"
    make_sequence_folder(str(root), n_frames=8, n_events=500)
    targets = str(tmp_path / "targets.json")
    base = ["--harness_mode", "wo_flow", "--dataset", "ECD",
            "--image_dim", str(H), str(W), "--model_mode", "cista-idnet",
            "--path_to_test_data", str(tmp_path / "data"),
            "-o", str(tmp_path / "out"), "--test_data_mode", "real",
            "--num_events", "800", "--flow_iters", "1",
            "--no_write_image", "--targets", targets]
    assert eval_harness.main(base + ["--save_targets"]) == 0
    assert eval_harness.main(base) == 0  # deterministic re-run passes

    t = json.load(open(targets))
    t["psnr"] *= 1.10  # 10% off > 1% tolerance
    json.dump(t, open(targets, "w"))
    assert eval_harness.main(base) == 1


def test_train_cli_two_epochs(tmp_path):
    import train as train_cli

    root = str(tmp_path / "train")
    os.makedirs(root, exist_ok=True)
    make_train_txt(root, n_videos=2, frames_per_video=4, n_events=200)
    cfg = Config(image_dim=(H, W), model_mode="cista-eraft",
                 path_to_train_data=root,
                 path_to_model=str(tmp_path / "models"),
                 len_sequence=3, batch_size=2, epochs=2,
                 flow_epoch=1, rec_epoch=1, flow_iters=1, shuffle=False)
    trainer = train_cli.Trainer(cfg)
    trainer.run()
    # epoch-1 checkpoint written per the reference schedule
    ckpts = os.listdir(trainer.path_to_model)
    assert any(c.endswith("_1.pth.tar") for c in ckpts)
    assert any(c.endswith("_2.pth.tar") for c in ckpts)


def test_train_cli_gtflow_pretraining(tmp_path):
    """CISTA (GT Flow) pretraining — no flow net, GT flow drives warps."""
    import train as train_cli

    root = str(tmp_path / "train")
    os.makedirs(root, exist_ok=True)
    make_train_txt(root, n_videos=1, frames_per_video=4, n_events=200)
    cfg = Config(image_dim=(H, W), model_mode="cista-gtflow",
                 path_to_train_data=root,
                 path_to_model=str(tmp_path / "models"),
                 len_sequence=3, batch_size=1, epochs=1,
                 flow_epoch=0, rec_epoch=0, shuffle=False)
    trainer = train_cli.Trainer(cfg)
    trainer.run()
    ckpts = os.listdir(trainer.path_to_model)
    assert any(c.endswith("_1.pth.tar") for c in ckpts)
    # the exported cista checkpoint loads into the upstream CistaLSTCNet
    add_reference_to_path()
    import torch
    from e2v.e2v_model import CistaLSTCNet

    path = os.path.join(trainer.path_to_model, ckpts[0])
    sd = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    cista_sd = {k[len("cista_net."):]: v for k, v in sd.items()
                if k.startswith("cista_net.")}
    net = CistaLSTCNet(image_dim=(H, W), base_channels=64, depth=5, num_bins=5)
    net.load_state_dict(cista_sd, strict=True)


def test_noeval_cli(tmp_path):
    """Raw-stream inference via FixedSizeEventReader on a txt event file."""
    import test_noeval as noeval_cli

    rng = np.random.default_rng(5)
    n = 3000
    t = np.sort(rng.random(n))
    ev = np.stack([t, rng.integers(0, W, n), rng.integers(0, H, n),
                   rng.integers(0, 2, n)], axis=1)
    path = str(tmp_path / "events.txt")
    np.savetxt(path, ev, fmt="%.6f %d %d %d")

    cfg = Config(image_dim=(H, W), model_mode="cista-idnet",
                 path_to_test_data=path,
                 output_folder=str(tmp_path / "out"),
                 num_events=800, test_img_num=3, flow_iters=1)
    noeval_cli.run(cfg)
    pngs = [f for _, _, files in os.walk(str(tmp_path / "out"))
            for f in files if f.endswith(".png")]
    assert pngs


def test_noeval_cli_samsung_rotation(tmp_path):
    """The Samsung-DVS 180-degree rotation path (ref: test_noeval.py:142-143):
    feeding the 180-rotated event stream with --dvs samsung must reproduce the
    unrotated stream's reconstructions exactly (the rotation is applied to the
    voxel before the model; hot-pixel filtering + nonzero normalization are
    per-pixel permutation-invariant, so the voxels are bit-identical)."""
    import test_noeval as noeval_cli

    rng = np.random.default_rng(6)
    n = 2400
    t = np.sort(rng.random(n))
    x = rng.integers(0, W, n)
    y = rng.integers(0, H, n)
    p = rng.integers(0, 2, n)

    def write(path, x, y):
        np.savetxt(path, np.stack([t, x, y, p], axis=1), fmt="%.6f %d %d %d")

    # same basename in both dirs -> same dataset name -> same output relpaths
    os.makedirs(str(tmp_path / "plain"))
    os.makedirs(str(tmp_path / "rot"))
    plain = str(tmp_path / "plain" / "stream.txt")
    rot = str(tmp_path / "rot" / "stream.txt")
    write(plain, x, y)
    write(rot, W - 1 - x, H - 1 - y)  # 180-degree rotated stream

    def run(path, out, dvs):
        cfg = Config(image_dim=(H, W), model_mode="cista-idnet",
                     path_to_test_data=path, output_folder=str(tmp_path / out),
                     num_events=800, test_img_num=2, flow_iters=1, dvs=dvs)
        noeval_cli.run(cfg)
        base = str(tmp_path / out)
        imgs = {}
        for root, _, files in os.walk(base):
            for f in files:
                if f.endswith(".png"):
                    full = os.path.join(root, f)
                    imgs[os.path.relpath(full, base)] = cv2.imread(
                        full, cv2.IMREAD_GRAYSCALE)
        return imgs

    a = run(plain, "out_plain", dvs=None)
    b = run(rot, "out_rot", dvs="samsung")
    recs = [f for f in a if f in b]
    assert recs, "no written frames to compare"
    for f in recs:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


def test_pretrain_flow_cli(tmp_path):
    """DCEIFlow pretraining on a synthetic FlyingChairs2 fixture; checkpoint
    loads into the upstream DCEIFlow via its own _load_net_from_checkpoint."""
    import pretrain_flow

    h5py = pytest.importorskip("h5py")
    import cv2

    from cista_flow_tpu.data import file_io

    rng = np.random.default_rng(9)
    root = tmp_path / "fc2"
    (root / "train").mkdir(parents=True)
    (root / "events_train").mkdir()
    HH, WW = 64, 96
    for i in range(2):
        base = f"{i:07d}"
        for sfx in ("img_0", "img_1"):
            cv2.imwrite(str(root / "train" / f"{base}-{sfx}.png"),
                        (rng.random((HH, WW, 3)) * 255).astype(np.uint8))
        for sfx in ("flow_01", "flow_10"):
            file_io.write_flo(str(root / "train" / f"{base}-{sfx}.flo"),
                              rng.standard_normal((HH, WW, 2)).astype(np.float32))
        with h5py.File(str(root / "events_train" / f"{base}-event.hdf5"), "w") as f:
            n = 300
            f["x"] = rng.integers(0, WW, n)
            f["y"] = rng.integers(0, HH, n)
            f["t"] = np.sort(rng.random(n))
            f["p"] = rng.choice([-1, 1], n)

    cfg = Config(image_dim=(48, 64), model_mode="cista-eiflow",
                 path_to_train_data=str(root),
                 path_to_model=str(tmp_path / "models"),
                 batch_size=2, epochs=1, flow_iters=1, shuffle=False)
    pretrain_flow.main(cfg)

    ckpt = os.path.join(str(tmp_path / "models"), "dceiflow_b5",
                        "dceiflow_1.pth.tar")
    assert os.path.exists(ckpt)

    add_reference_to_path()
    from DCEIFlow.DCEIFlow import DCEIFlow

    class RefCfg:
        image_dim = (48, 64)
        ds = 8
        is_bi = False

    net = DCEIFlow(num_bins=5, args=RefCfg())
    before = {k: v.clone() for k, v in net.state_dict().items()}
    net._load_net_from_checkpoint(ckpt)
    # weights actually changed (loader found matching keys)
    changed = sum(1 for k in before
                  if not np.array_equal(before[k].numpy(),
                                        net.state_dict()[k].numpy()))
    assert changed > 50

    # shared loop, raft arch: /32-divisible crop, raft-layout checkpoint
    cfg2 = Config(image_dim=(32, 64), model_mode="cista-eiflow",
                  path_to_train_data=str(root),
                  path_to_model=str(tmp_path / "models2"),
                  batch_size=2, epochs=1, flow_iters=1, shuffle=False)
    cfg2.flow_arch = "raft"
    pretrain_flow.main(cfg2)
    ckpt2 = os.path.join(str(tmp_path / "models2"), "raft_b5",
                         "raft_1.pth.tar")
    assert os.path.exists(ckpt2)
    import torch

    from cista_flow_tpu.ckpt import torch_import as ti2
    sd2 = torch.load(ckpt2, map_location="cpu", weights_only=False)["model"]
    p2, s2 = ti2.raft_params({k: v.numpy() for k, v in sd2.items()})
    assert "mask" in p2["update"]


def test_train_orbax_exact_resume(tmp_path):
    """--load_epoch_for_train -1 restores params + optimizer moments."""
    import train as train_cli

    root = str(tmp_path / "train")
    os.makedirs(root, exist_ok=True)
    make_train_txt(root, n_videos=1, frames_per_video=4, n_events=200)
    kw = dict(image_dim=(H, W), model_mode="cista-gtflow",
              path_to_train_data=root, path_to_model=str(tmp_path / "m"),
              len_sequence=3, batch_size=1, flow_epoch=0, rec_epoch=0,
              shuffle=False, orbax_ckpt=True)
    t1 = train_cli.Trainer(Config(epochs=1, **kw))
    t1.run()

    t2 = train_cli.Trainer(Config(epochs=2, load_epoch_for_train=-1, **kw))
    rdir, rstep = t2._orbax_resume
    assert rstep == 1 and rdir.endswith("orbax")
    # params match the end of the first run
    a = np.asarray(t1.params["cista"]["final"]["w"])
    b = np.asarray(t2.params["cista"]["final"]["w"])
    np.testing.assert_array_equal(a, b)
    # Adam moments restored (non-zero after step 1)
    mus = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        t2.opt_state.inner_state[0].mu)]
    assert any(np.abs(m).max() > 0 for m in mus)
    t2.run()


def test_train_step_level_preemption_resume(tmp_path):
    """--save_every_steps N writes mid-epoch preemption checkpoints; with no
    completed-epoch save, -1 resume restores from the latest step save and
    restarts that epoch."""
    import train as train_cli

    root = str(tmp_path / "train")
    os.makedirs(root, exist_ok=True)
    make_train_txt(root, n_videos=2, frames_per_video=4, n_events=200)
    kw = dict(image_dim=(H, W), model_mode="cista-gtflow",
              path_to_train_data=root, path_to_model=str(tmp_path / "m"),
              len_sequence=3, batch_size=1, flow_epoch=0, rec_epoch=0,
              shuffle=False, save_every_steps=1)
    t1 = train_cli.Trainer(Config(epochs=1, **kw))
    t1.run()  # simulated preemption: only step-level saves exist
    assert os.path.isdir(os.path.join(t1.path_to_model, "orbax_steps"))

    t2 = train_cli.Trainer(Config(epochs=1, load_epoch_for_train=-1, **kw))
    rdir, rstep = t2._orbax_resume
    assert rdir.endswith("orbax_steps")
    assert t2.cfgs.load_epoch_for_train == 0  # restart the interrupted epoch
    assert t2._resume_global_step == rstep > 0
    a = np.asarray(t1.params["cista"]["final"]["w"])
    b = np.asarray(t2.params["cista"]["final"]["w"])
    np.testing.assert_array_equal(a, b)
    # Adam moments came back too
    mus = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        t2.opt_state.inner_state[0].mu)]
    assert any(np.abs(m).max() > 0 for m in mus)
    t2.run()


@pytest.mark.parametrize("mode", ["cista-eiflow", "cista-idnet"])
def test_checkpoint_roundtrip_other_composites(tmp_path, mode):
    add_reference_to_path()
    import torch

    cfg = Config(image_dim=(H, W), model_mode=mode)
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "c.pth.tar")
    ti.save_torch_checkpoint(path, params, mstate, mode, epoch=1,
                             depth=cfg.depth)

    class RefCfg:
        image_dim = (H, W)
        num_bins = 5
        depth = 5
        base_channels = 64
        ds = 8
        is_bi = False
        warp_mode = "forward"

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if mode == "cista-eiflow":
        from e2v.e2v_model import DCEIFlowCistaNet

        ref = DCEIFlowCistaNet(RefCfg())
    else:
        from e2v.e2v_model import IDCistaNet

        ref = IDCistaNet(RefCfg())
    ref.load_state_dict(ckpt["state_dict"], strict=True)

    p2, _ = ti.composite_params(ti.load_state_dict(path), mode)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(p2)
    assert len(a) == len(b)
