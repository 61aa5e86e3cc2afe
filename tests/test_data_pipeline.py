"""Data pipeline tests on synthetic fixtures; ImageReader parity vs reference."""
import os

import numpy as np
import pytest

from conftest import add_reference_to_path
from cista_flow_tpu.configs import Config
from cista_flow_tpu.data import (
    ImageReader,
    StackedSequenceLoader,
    TrainSequenceDataset,
    read_timestamps_file,
)

cv2 = pytest.importorskip("cv2")

RNG = np.random.default_rng(33)
H, W = 32, 48


def make_sequence_folder(root, n_frames=8, n_events=400):
    os.makedirs(root, exist_ok=True)
    ts = np.cumsum(RNG.random(n_frames) * 0.01)
    with open(os.path.join(root, "timestamps.txt"), "w") as f:
        for i, t in enumerate(ts):
            f.write(f"frame_{i:04d} {t}\n")
    for i in range(n_frames):
        img = (RNG.random((H, W)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, f"frame_{i:04d}.png"), img)
    for i in range(n_frames - 1):
        t = np.sort(RNG.uniform(ts[i], ts[i + 1], n_events))
        x = RNG.integers(0, W, n_events)
        y = RNG.integers(0, H, n_events)
        p = RNG.integers(0, 2, n_events)
        np.savez(os.path.join(root, f"events_{i:06d}.npz"), t=t, x=x, y=y, p=p)
        flow01 = RNG.standard_normal((2, H, W)).astype(np.float32)
        flow10 = RNG.standard_normal((2, H, W)).astype(np.float32)
        np.savez(os.path.join(root, f"flow_{i:06d}.npz"),
                 flow01=flow01, flow10=flow10)
    return ts


def make_train_txt(root, n_videos=2, frames_per_video=6, n_events=300):
    lines = []
    for vid in range(n_videos):
        vdir = os.path.join(root, f"v{vid}")
        os.makedirs(vdir, exist_ok=True)
        ts = np.cumsum(RNG.random(frames_per_video) * 0.01)
        for i in range(frames_per_video):
            img = (RNG.random((H, W)) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(vdir, f"img_{i:04d}.png"), img)
        for i in range(frames_per_video - 1):
            t = np.sort(RNG.uniform(ts[i], ts[i + 1], n_events))
            np.savez(os.path.join(vdir, f"ev_{i:06d}.npz"),
                     t=t, x=RNG.integers(0, W, n_events),
                     y=RNG.integers(0, H, n_events),
                     p=RNG.integers(0, 2, n_events))
            np.savez(os.path.join(vdir, f"flow_{i:06d}.npz"),
                     flow01=RNG.standard_normal((2, H, W)).astype(np.float32),
                     flow10=RNG.standard_normal((2, H, W)).astype(np.float32))
            lines.append(
                f"{vid + 1} {n_events} {ts[i]} {ts[i + 1]} "
                f"v{vid}/img_{i:04d}.png v{vid}/img_{i + 1:04d}.png "
                f"v{vid}/ev_{i:06d}.npz v{vid}/flow_{i:06d}.npz")
    txt = os.path.join(root, "train_e2v_estflow.txt")
    with open(txt, "w") as f:
        f.write("\n".join(lines))
    return txt


def test_image_reader_matches_reference(tmp_path):
    add_reference_to_path()
    from data_readers.video_readers import ImageReader as RefReader

    root = str(tmp_path / "seq")
    make_sequence_folder(root)

    cfg = Config(image_dim=(H, W), dataset="SIM", test_data_mode="upsampled")
    mine = ImageReader(cfg)
    mine.initialize(root, -1)

    class RefCfg:
        image_dim = (H, W)
        num_bins = 5
        time_unit = "s"
        is_forward_flow = False
        warp_mode = "forward"
        dataset = "SIM"

    ref = RefReader(RefCfg(), device="cpu")
    ref.initialize(root, -1)

    steps = 0
    while not mine.ending and not ref.ending:
        ev_m, fp_m, gt_m, flow_m = mine.update_event_frame_flow_pack("upsampled")
        ev_r, fp_r, gt_r, flow_r = ref.update_event_frame_flow_pack("upsampled")
        np.testing.assert_allclose(ev_m[0], ev_r[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gt_m, gt_r, rtol=1e-6)
        np.testing.assert_allclose(flow_m[0], flow_r[0], rtol=1e-6)
        steps += 1
    assert mine.ending == ref.ending and steps >= 5


def test_timestamps_file_formats(tmp_path):
    p1 = tmp_path / "timestamps.txt"
    p1.write_text("a 1.0\nb 2.0\n")
    assert read_timestamps_file(str(p1)) == [1.0, 2.0]
    p2 = tmp_path / "images.txt"
    p2.write_text("1000000 x\n2000000 y\n")
    assert read_timestamps_file(str(p2), unit="us") == [1.0, 2.0]


def test_train_dataset_and_stacked_loader(tmp_path):
    root = str(tmp_path / "train")
    os.makedirs(root, exist_ok=True)
    txt = make_train_txt(root, n_videos=2, frames_per_video=6)

    cfg = Config(image_dim=(H, W), model_mode="cista-eraft", len_sequence=5,
                 path_to_train_data=root)
    ds = TrainSequenceDataset(txt, cfg)
    assert len(ds) == 2  # two videos
    seq = ds[0]
    assert len(seq) == 5  # 5 steps per video
    bd, bt = seq[0]
    assert bd["event_voxel"].shape == (5, H, W)
    assert bd["event_voxel_old"].shape == (5, H, W)
    assert bt["gt_img0"].shape == (H, W)
    assert bt["gt_flow"].shape == (2, H, W)
    # first step of a video has a zero old-voxel
    assert not bd["event_voxel_old"].any()
    assert ds[0][1][0]["event_voxel_old"].any()

    loader = StackedSequenceLoader(ds, batch_size=2, len_sequence=5,
                                   shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["event_voxel"].shape == (5, 2, H, W, 5)
    assert b["gt_flow"].shape == (5, 2, H, W, 2)
    assert b["gt_img1"].shape == (5, 2, H, W, 1)


def test_loader_process_sharding(tmp_path):
    """Multi-host loading: per-process loaders read disjoint chunk subsets of
    the single-process chunk list AND yield the SAME number of batches per
    epoch (uneven shards would deadlock the jitted step on one host)."""
    root = str(tmp_path / "train")
    os.makedirs(root, exist_ok=True)
    txt = make_train_txt(root, n_videos=3, frames_per_video=6)
    cfg = Config(image_dim=(H, W), model_mode="cista-eraft", len_sequence=5,
                 path_to_train_data=root)
    ds = TrainSequenceDataset(txt, cfg)
    full = StackedSequenceLoader(ds, batch_size=1, len_sequence=5,
                                 shuffle=False, num_workers=0)
    assert len(full.chunks) == 3  # odd count: forces the uneven-split case
    parts = [StackedSequenceLoader(ds, batch_size=1, len_sequence=5,
                                   shuffle=False, num_workers=0,
                                   process_index=i, process_count=2)
             for i in range(2)]
    key = lambda chunks: {tuple(c) for c in chunks}
    # disjoint, subsets of the full list, equal batch counts on every host
    assert key(parts[0].chunks) & key(parts[1].chunks) == set()
    assert (key(parts[0].chunks) | key(parts[1].chunks)) <= key(full.chunks)
    assert len(parts[0]) == len(parts[1]) == len(full.chunks) // 2


def test_shard_seq_batch_process_local_assembly():
    """The multi-host assembly path (make_array_from_process_local_data)
    produces the same global array as the single-process device_put path."""
    import jax
    import numpy as np
    from cista_flow_tpu import parallel

    mesh = parallel.make_mesh((4,), ("data",), jax.devices("cpu")[:4])
    host = {"event_voxel": np.random.default_rng(0).normal(
        size=(3, 8, 6, 6, 5)).astype(np.float32)}
    put = parallel.shard_seq_batch(host, mesh)["event_voxel"]
    sh = parallel.batch_sharding(mesh)
    assembled = jax.make_array_from_process_local_data(
        sh, host["event_voxel"])
    np.testing.assert_array_equal(np.asarray(put), np.asarray(assembled))
    assert assembled.sharding.is_equivalent_to(put.sharding, put.ndim)


def test_event_count_regrouping(tmp_path):
    root = str(tmp_path / "train2")
    os.makedirs(root, exist_ok=True)
    txt = make_train_txt(root, n_videos=1, frames_per_video=6, n_events=300)
    cfg = Config(image_dim=(H, W), model_mode="cista-eiflow", len_sequence=0,
                 num_events=500, path_to_train_data=root)
    ds = TrainSequenceDataset(txt, cfg)
    # groups of 2 lines reach 600 >= 500 events
    assert len(ds) == 1
    assert all(len(g) == 2 for g in ds.sequence_line_id[0])


def test_device_prefetch():
    import jax.numpy as jnp

    from cista_flow_tpu.data import device_prefetch

    items = [{"a": np.full((4,), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(items), size=2))
    assert len(out) == 5
    for i, o in enumerate(out):
        assert isinstance(o["a"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(o["a"]), items[i]["a"])
    # empty iterator
    assert list(device_prefetch(iter([]), size=2)) == []


def test_fixed_size_reader_k_shift_matches_reference(tmp_path):
    """Sliding-window overlap mode vs the upstream reader, window by window."""
    import sys

    from conftest import add_reference_to_path
    from cista_flow_tpu.data.event_readers import FixedSizeEventReader

    add_reference_to_path()
    from data_readers.event_readers import FixedSizeEventReader as RefReader

    rng = np.random.default_rng(3)
    n = 2000
    t = np.sort(rng.random(n))
    ev = np.stack([t, rng.integers(0, 64, n), rng.integers(0, 48, n),
                   rng.integers(0, 2, n)], axis=1)
    path = str(tmp_path / "events.txt")
    np.savetxt(path, ev, fmt="%.6f %d %d %d")

    for k_shift in (-1, 100, 300):
        mine = FixedSizeEventReader(path, num_events=500, k_shift=k_shift)
        ref = RefReader(path, num_events=500, k_shift=k_shift)
        for i in range(4):
            try:
                a = next(mine)
            except StopIteration:
                a = None
            try:
                b = np.asarray(next(ref))
                if len(b) == 0:
                    b = None
            except StopIteration:
                b = None
            if b is None:
                assert a is None or len(a) == 0
                break
            np.testing.assert_allclose(np.asarray(a), b,
                                       err_msg=f"k_shift={k_shift} win={i}")
