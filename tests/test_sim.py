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
