"""MVSEC dataset tests on a synthetic HDF5 fixture + GT-flow propagation
parity vs the reference implementation."""
import os

import numpy as np
import pytest

from conftest import add_reference_to_path

h5py = pytest.importorskip("h5py")
cv2 = pytest.importorskip("cv2")

RNG = np.random.default_rng(44)
H, W = 40, 56


def make_mvsec_hdf5(root, name="indoor_flying1", n_frames=30,
                    events_per_frame=200):
    os.makedirs(root, exist_ok=True)
    total_events = n_frames * events_per_frame
    t = np.sort(RNG.random(total_events) * 3.0)
    x = RNG.integers(0, W, total_events)
    y = RNG.integers(0, H, total_events)
    p = RNG.choice([-1, 1], total_events)
    events = np.stack([x, y, t, p], axis=1).astype(np.float64)

    image_ts = np.linspace(t[0], t[-1], n_frames)
    image_event_inds = np.searchsorted(t, image_ts).astype(np.int64)
    image_event_inds[-1] = total_events - 2
    images = (RNG.random((n_frames, H, W)) * 255).astype(np.uint8)

    with h5py.File(os.path.join(root, f"{name}_data.hdf5"), "w") as f:
        g = f.create_group("davis/left")
        g.create_dataset("events", data=events)
        g.create_dataset("image_raw", data=images)
        g.create_dataset("image_raw_ts", data=image_ts)
        g.create_dataset("image_raw_event_inds", data=image_event_inds)

    n_flow = n_frames * 2
    flow_ts = np.linspace(t[0] - 0.01, t[-1] + 0.01, n_flow)
    flows = RNG.standard_normal((n_flow, 2, H, W)).astype(np.float32)
    with h5py.File(os.path.join(root, f"{name}_gt.hdf5"), "w") as f:
        g = f.create_group("davis/left")
        g.create_dataset("flow_dist", data=flows)
        g.create_dataset("flow_dist_ts", data=flow_ts)


@pytest.fixture()
def small_valid_range(monkeypatch):
    from cista_flow_tpu.data import mvsec

    monkeypatch.setitem(mvsec.VALID_TIME_INDEX, "indoor_flying1", [2, 20])
    return mvsec


def test_mvsec_ne_dataset(tmp_path, small_valid_range, monkeypatch):
    mvsec = small_valid_range
    root = str(tmp_path / "mvsec")
    make_mvsec_hdf5(root)

    class Cfg:
        num_bins = 5
        num_events = 150

    ds = mvsec.MVSEC_NE(Cfg(), root, data_split="indoor_flying1")
    # shrink the sensor geometry to the fixture
    ds.width, ds.height = W, H
    ds.crop_size = (H, W)
    assert len(ds) > 3

    raw_events_list, batch = ds[0]
    assert batch["gt_img0"].shape == (1, H, W)
    assert batch["gt_flow"].shape == (2, H, W)
    assert batch["flow_valid"].shape == (1, H, W)
    # chunks approximately num_events sized, [t,x,y,p] layout
    chunk, n = raw_events_list[0]
    assert n == chunk.shape[0]
    assert chunk.shape[1] == 4
    assert np.all(np.diff(chunk[:, 0]) >= 0)  # time-ordered

    voxel = ds.events_to_voxel(np.concatenate(
        [c for c, _ in raw_events_list], axis=0), ds.height, ds.width)
    assert voxel.shape == (5, H, W)
    nz = voxel[voxel != 0]
    np.testing.assert_allclose(nz.mean(), 0.0, atol=0.2)


def test_mvsec_voxel_dataset(tmp_path, small_valid_range):
    mvsec = small_valid_range
    root = str(tmp_path / "mvsec2")
    make_mvsec_hdf5(root)

    class Cfg:
        num_bins = 5
        num_events = 150

    ds = mvsec.MVSEC(Cfg(), root, data_split="indoor_flying1")
    ds.crop_size = (H, W)
    item = ds[1]
    assert item["event_voxel"].shape == (5, H, W)
    assert item["gt_img0"].shape == (3, H, W)
    assert item["gt_flow"].shape == (2, H, W)


def test_gt_flow_propagation_matches_reference():
    add_reference_to_path()
    from data_readers.MVSEC_utils import (
        generate_corresponding_gt_flow as ref_gen,
    )

    from cista_flow_tpu.data.mvsec_utils import generate_corresponding_gt_flow

    flows = RNG.standard_normal((4, 2, H, W)).astype(np.float32)
    flows_ts = np.array([0.0, 0.1, 0.2, 0.3, 0.4], np.float32)
    # multi-flow propagation window
    got = generate_corresponding_gt_flow(flows.copy(), flows_ts, 0.05, 0.35)
    ref = ref_gen(flows.copy(), flows_ts.copy(), 0.05, 0.35)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # single-interval shortcut
    got = generate_corresponding_gt_flow(flows[:1].copy(), flows_ts[:2], 0.02, 0.08)
    ref = ref_gen(flows[:1].copy(), flows_ts[:2].copy(), 0.02, 0.08)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_triangular_voxel_matches_reference():
    add_reference_to_path()
    from data_readers.MVSEC_utils import eventsToVoxel as ref_voxel

    from cista_flow_tpu.data.mvsec_utils import events_to_voxel_triangular

    n = 1000
    t = np.sort(RNG.random(n))
    x = RNG.integers(0, W, n)
    y = RNG.integers(0, H, n)
    p = RNG.choice([-1, 1], n)
    events_xytp = np.stack([x, y, t, p], axis=1)
    ref = ref_voxel(events_xytp.copy(), num_bins=5, height=H, width=W)
    got = events_to_voxel_triangular(events_xytp, 5, H, W)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mvsec_cli_e2e(tmp_path, small_valid_range):
    """Full test_mvsec CLI on a small synthetic fixture (injected dims)."""
    import test_mvsec as mvsec_cli
    from cista_flow_tpu.configs import Config

    mvsec = small_valid_range
    root = str(tmp_path / "data" / "indoor")
    make_mvsec_hdf5(root)

    def factory(cfgs, path, name):
        ds = mvsec.MVSEC_NE(cfgs, data_root=path, data_split=name)
        ds.width, ds.height = W, H
        ds.crop_size = (H, W)
        return ds

    cfg = Config(image_dim=(H, W), model_mode="cista-eraft",
                 path_to_test_data=str(tmp_path / "data"),
                 output_folder=str(tmp_path / "out"),
                 num_events=150, test_img_num=8, flow_iters=1)
    results, keys = mvsec_cli.evaluate(cfg, dataset_factory=factory)
    assert results[-1][0] == "mean"
    assert np.isfinite(np.asarray(results[0][1:-1], dtype=float)).all()
