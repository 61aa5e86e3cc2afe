"""Event-camera simulator: ESIM contrast-model exactness, GT-flow/frame/event
mutual consistency, and reader-layout compatibility (cista_flow_tpu/data/sim.py).
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from cista_flow_tpu.configs import Config
from cista_flow_tpu.data import sim
from cista_flow_tpu.data.video_readers import ImageReader
from cista_flow_tpu.data.train_loader import TrainSequenceDataset
from cista_flow_tpu.events.voxel import events_to_voxel_grid
from cista_flow_tpu.losses.fwl import fwl_metric

cv2 = pytest.importorskip("cv2")

H, W = 60, 80


@pytest.fixture(scope="module")
def seq():
    return sim.simulate_sequence(3, 6, H, W, substeps=6)


def test_deterministic(seq):
    again = sim.simulate_sequence(3, 6, H, W, substeps=6)
    np.testing.assert_array_equal(seq["frames"], again["frames"])
    for (t, x, y, p), (t2, x2, y2, p2) in zip(seq["events"], again["events"]):
        np.testing.assert_array_equal(t, t2)
        np.testing.assert_array_equal(p, p2)


def test_contrast_model_exact(seq):
    """ESIM invariant: per pixel, C * (n_pos - n_neg) tracks the total
    log-intensity change to within one threshold."""
    c = 0.18
    l0 = np.log(1e-2 + seq["frames"][0].astype(np.float64))
    l1 = np.log(1e-2 + seq["frames"][-1].astype(np.float64))
    signed = np.zeros((H, W))
    for t, x, y, p in seq["events"]:
        np.add.at(signed, (y, x), 2 * p - 1)
    resid = np.abs((l1 - l0) - c * signed)
    assert resid.max() < c + 1e-9


def test_events_sorted_and_in_window(seq):
    ts = seq["timestamps"]
    for i, (t, x, y, p) in enumerate(seq["events"]):
        assert (np.diff(t) >= 0).all()
        assert t.min() >= ts[i] - 1e-12 and t.max() <= ts[i + 1] + 1e-12
        assert x.min() >= 0 and x.max() < W and y.min() >= 0 and y.max() < H
        assert set(np.unique(p)) <= {0, 1}
        assert len(t) > 50  # moving texture generates real event density


def test_gt_flow_warps_frames(seq):
    """frame1[p] == frame0[p + flow10[p]] (the exact field the composite's
    'forward' warp consumes via the reader's -flow10)."""
    px, py = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    for i in range(len(seq["events"])):
        f = seq["flow10"][i]
        w0 = sim._sample_bilinear(seq["frames"][i].astype(np.float64),
                                  px + f[0], py + f[1])
        err = np.abs(w0 - seq["frames"][i + 1])[6:-6, 6:-6]
        # residual is double-bilinear-interpolation smoothing, not flow error
        # (interval 0 is exact to 1e-7: frame 0 sits on the texture grid)
        lim = (1e-6, 1e-6) if i == 0 else (0.1, 0.02)
        assert err.max() < lim[0] and err.mean() < lim[1], \
            f"interval {i}: warp err max {err.max()} mean {err.mean()}"


def test_flow01_flow10_inverse(seq):
    """Transporting forward then backward returns the identity."""
    px, py = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    f01 = seq["flow01"][2]
    qx, qy = px + f01[0], py + f01[1]
    f10x = sim._sample_bilinear(seq["flow10"][2][0].astype(np.float64), qx, qy)
    f10y = sim._sample_bilinear(seq["flow10"][2][1].astype(np.float64), qx, qy)
    # interior only: at the borders q leaves the frame and the sampler clamps
    c = np.s_[6:-6, 6:-6]
    np.testing.assert_allclose((qx + f10x)[c], px[c], atol=1e-5)
    np.testing.assert_allclose((qy + f10y)[c], py[c], atol=1e-5)


def test_fwl_above_one(seq):
    """Events are flow-aligned by construction: warping the voxel bins along
    the GT flow must SHARPEN it (FWL > 1) — the physical-consistency metric
    the reference computes on real data (ref: loss.py:27-83)."""
    t, x, y, p = seq["events"][2]
    ev = np.stack([t, x, y, p], axis=1)
    voxel = events_to_voxel_grid(ev, 5, W, H)
    flow = -seq["flow10"][2]  # reader convention: coef -1 on flow10
    v = jnp.asarray(voxel.transpose(1, 2, 0))[None]   # (1, H, W, bins)
    f = jnp.asarray(flow.transpose(1, 2, 0))[None]    # (1, H, W, 2)
    fwl = float(fwl_metric(v, f))
    assert fwl > 1.15, f"FWL {fwl} — events not aligned with GT flow"


def test_eval_layout_readable(tmp_path, seq):
    sim.write_eval_sequence(str(tmp_path / "s0"), seq)
    cfg = Config(image_dim=(H, W), dataset="SIM", test_data_mode="upsampled")
    reader = ImageReader(cfg)
    reader.initialize(str(tmp_path / "s0"), -1)
    steps = 0
    while not reader.ending:
        ev, fp, gt, flow = reader.update_event_frame_flow_pack("upsampled")
        assert ev[0].shape == (5, H, W)
        assert gt.shape == (H, W) and flow[0].shape == (2, H, W)
        # reader hands the model -flow10
        np.testing.assert_allclose(flow[0], -seq["flow10"][steps], rtol=1e-6)
        steps += 1
    assert steps == 5


def test_train_layout_readable(tmp_path):
    path = sim.write_train_dataset(str(tmp_path), n_videos=2, n_frames=4,
                                   h=H, w=W, substeps=4)
    assert os.path.basename(path) == "train_e2v_estflow.txt"
    cfg = Config(image_dim=(H, W), path_to_train_data=str(tmp_path),
                 len_sequence=3)
    ds = TrainSequenceDataset(path, cfg)
    assert len(ds) >= 2
    seq_items = ds[0]
    assert len(seq_items) == 3
    bd, bt = seq_items[0]
    assert bd["event_voxel"].shape == (5, H, W)
    assert bt["gt_flow"].shape == (2, H, W)
    assert bt["gt_img0"].shape == (H, W)


def test_cli_main(tmp_path):
    rc = sim.main(["--out", str(tmp_path / "d"), "--mode", "eval",
                   "--image_dim", str(H), str(W), "--n_frames", "4",
                   "--substeps", "3", "--n_sequences", "2"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "d" / "sim_01" / "timestamps.txt"))


def _sim_flow_pairs(tmp_path, h=32, w=32):
    sim.write_train_dataset(str(tmp_path), n_videos=1, n_frames=5,
                            h=h, w=w, substeps=4, speed=30.0)
    from cista_flow_tpu.data.sim import SimFlowPairs
    cfg = Config(model_mode="cista-eiflow", image_dim=(h, w),
                 path_to_train_data=str(tmp_path), len_sequence=1,
                 flow_iters=2)
    return SimFlowPairs(cfg), cfg


def test_sim_flow_pairs_schema(tmp_path):
    """SimFlowPairs (the sim-data flow-pretraining adapter) yields the
    FlyingChairs2 item schema, and the gt_flow target is the generator's
    forward field (flow01), not the warp-sign-mangled composite field."""
    h = w = 32
    ds, _ = _sim_flow_pairs(tmp_path, h, w)
    assert len(ds) == 4
    item = ds[1]
    assert item["event_voxel"].shape == (5, h, w)
    assert item["gt_img0"].shape == (1, h, w)
    assert item["gt_flow"].shape == (2, h, w)
    assert item["valid"].shape == (1, h, w)
    raw = np.load(os.path.join(str(tmp_path), "v000", "flow_000001.npz"))
    np.testing.assert_array_equal(item["gt_flow"], raw["flow01"])


@pytest.mark.slow
def test_sim_flow_pairs_train_step(tmp_path):
    """One supervised pretrain_flow step on sim pairs runs to finite loss."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import optax
    import pretrain_flow as pf
    from cista_flow_tpu.models import dceiflow

    ds, cfg = _sim_flow_pairs(tmp_path)
    params, state = dceiflow.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    step = pf.make_train_step(cfg, opt, is_bi=False)
    rng = np.random.default_rng(0)
    batch = next(pf.make_batches(ds, 2, False, rng))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params, state, opt_state, loss, epe = step(params, state, opt_state, jb)
    assert np.isfinite(float(loss)) and np.isfinite(float(epe))


def test_sim_flow_pairs_aug_flips(tmp_path):
    """Every augmented item is one of the 4 flip variants of the base item,
    with the matching flow components negated (flipping a flow field's
    spatial axis must negate that axis's displacement)."""
    from cista_flow_tpu.data.sim import SimFlowPairs
    h = w = 32
    sim.write_train_dataset(str(tmp_path), n_videos=1, n_frames=5,
                            h=h, w=w, substeps=4, speed=30.0)
    cfg = Config(model_mode="cista-eiflow", image_dim=(h, w),
                 path_to_train_data=str(tmp_path), len_sequence=1)
    base = SimFlowPairs(cfg)[2]
    aug_ds = SimFlowPairs(cfg, aug=True)

    def variant(hf, vf):
        out = {}
        for k, v in base.items():
            if hf:
                v = v[..., ::-1]
            if vf:
                v = v[..., ::-1, :]
            v = np.ascontiguousarray(v)
            if k == "gt_flow":
                if hf:
                    v[0] = -v[0]
                if vf:
                    v[1] = -v[1]
            out[k] = v
        return out

    variants = [variant(hf, vf) for hf in (0, 1) for vf in (0, 1)]
    seen = set()
    for _ in range(24):
        item = aug_ds[2]
        match = None
        for vi, v in enumerate(variants):
            if all(np.array_equal(item[k], v[k]) for k in item):
                match = vi
                break
        assert match is not None, "augmented item is not a flip variant"
        seen.add(match)
    assert len(seen) >= 3  # all four appear w.h.p.; require most
