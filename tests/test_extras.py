"""Tests for the vendored-extras equivalents: file I/O, augmentors,
FlyingChairs2, IDN losses, InputPadder, debug panels."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from cista_flow_tpu.data import augmentors, file_io
from cista_flow_tpu.losses import idn_losses
from cista_flow_tpu.utils import InputPadder, setup_seed

RNG = np.random.default_rng(88)


def test_flo_roundtrip(tmp_path):
    flow = RNG.standard_normal((20, 30, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    file_io.write_flo(p, flow)
    back = file_io.read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_flo_matches_reference_reader(tmp_path):
    from conftest import add_reference_to_path

    add_reference_to_path()
    from DCEIFlow.utils.file_io import readFlow as ref_read

    flow = RNG.standard_normal((14, 22, 2)).astype(np.float32)
    p = str(tmp_path / "b.flo")
    file_io.write_flo(p, flow)
    np.testing.assert_allclose(ref_read(p), flow)


def test_kitti_flow_roundtrip(tmp_path):
    pytest.importorskip("cv2")
    flow = (RNG.standard_normal((16, 24, 2)) * 10).astype(np.float32)
    valid = RNG.integers(0, 2, (16, 24)).astype(np.float32)
    p = str(tmp_path / "k.png")
    file_io.write_flow_kitti(p, flow, valid)
    back, v = file_io.read_flow_kitti(p)
    np.testing.assert_allclose(back, flow, atol=1 / 64.0)
    np.testing.assert_array_equal(v, valid)


def test_pfm_reader(tmp_path):
    data = RNG.standard_normal((10, 12)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n12 10\n-1.0\n")
        np.flipud(data).astype("<f").tofile(f)
    np.testing.assert_allclose(file_io.read_pfm(p), data)


def test_event_h5_reader(tmp_path):
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "ev.h5")
    with h5py.File(p, "w") as f:
        f["x"] = np.arange(5)
        f["y"] = np.arange(5) + 1
        f["t"] = np.linspace(0, 1, 5)
        f["p"] = np.ones(5)
    ev = file_io.read_event_h5(p)
    assert ev.shape == (5, 4)
    np.testing.assert_allclose(ev[:, 0], np.arange(5))


def test_event_flow_augmentor():
    pytest.importorskip("cv2")
    aug = augmentors.EventFlowAugmentor(crop_size=(24, 32), do_flip=True,
                                        seed=0)
    voxel = RNG.standard_normal((5, 40, 50)).astype(np.float32)
    img1 = (RNG.random((40, 50, 3)) * 255).astype(np.uint8)
    img2 = (RNG.random((40, 50, 3)) * 255).astype(np.uint8)
    flow = RNG.standard_normal((40, 50, 2)).astype(np.float32)
    v, i1, i2, f, f10, occ, occ10, vr = aug(voxel, img1, img2, flow,
                                            flow10=flow.copy())
    assert v.shape == (5, 24, 32)
    assert i1.shape == (24, 32, 3) and i2.shape == (24, 32, 3)
    assert f.shape == (24, 32, 2) and f10.shape == (24, 32, 2)
    assert occ is None and occ10 is None and vr is None


def test_flip_flow_sign_fixes():
    flow = RNG.standard_normal((8, 10, 2)).astype(np.float32)
    h = augmentors.horizontal_flip_flow(flow)
    np.testing.assert_allclose(h[:, ::-1, 0], -flow[..., 0])
    np.testing.assert_allclose(h[:, ::-1, 1], flow[..., 1])
    v = augmentors.vertical_flip_flow(flow)
    np.testing.assert_allclose(v[::-1, :, 1], -flow[..., 1])


def test_flying_chairs2(tmp_path):
    pytest.importorskip("cv2")
    h5py = pytest.importorskip("h5py")
    import cv2

    from cista_flow_tpu.data import FlyingChairs2

    root = tmp_path / "fc2"
    (root / "train").mkdir(parents=True)
    (root / "events_train").mkdir()
    for i in range(3):
        base = f"{i:07d}"
        for suffix in ("img_0", "img_1"):
            img = (RNG.random((16, 20, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / "train" / f"{base}-{suffix}.png"), img)
        for suffix in ("flow_01", "flow_10"):
            file_io.write_flo(str(root / "train" / f"{base}-{suffix}.flo"),
                              RNG.standard_normal((16, 20, 2)).astype(np.float32))
        with h5py.File(str(root / "events_train" / f"{base}-event.hdf5"), "w") as f:
            n = 200
            f["x"] = RNG.integers(0, 20, n)
            f["y"] = RNG.integers(0, 16, n)
            f["t"] = np.sort(RNG.random(n))
            f["p"] = RNG.choice([-1, 1], n)

    class Args:
        num_bins = 5
        is_bi = True

    ds = FlyingChairs2(Args(), str(root), data_kind="train",
                       validate_indices=[1])
    assert len(ds) == 2  # index 1 held out for validation
    item = ds[0]
    assert item["event_voxel"].shape == (5, 16, 20)
    assert item["event_voxel_bw"].shape == (5, 16, 20)
    assert item["gt_flow"].shape == (2, 16, 20)
    assert item["gt_img0"].shape == (3, 16, 20)

    val = FlyingChairs2(Args(), str(root), data_kind="val",
                        validate_indices=[1])
    # val split uses the val/ folder which is empty here
    assert len(val) == 0


def test_idn_losses():
    e = jnp.asarray(RNG.standard_normal((2, 8, 10, 2)).astype(np.float32))
    g = jnp.asarray(RNG.standard_normal((2, 8, 10, 2)).astype(np.float32))
    mask = jnp.asarray((RNG.random((2, 8, 10, 1)) > 0.5).astype(np.float32))
    l1 = float(idn_losses.sparse_l1(e, g, mask))
    assert l1 > 0
    # empty mask -> exactly zero
    assert float(idn_losses.sparse_l1(e, g, jnp.zeros_like(mask))) == 0.0
    assert float(idn_losses.sparse_lnorm(2, e, g, mask)) > 0
    assert float(idn_losses.charbonnier_loss(e - g)) > 0
    assert float(idn_losses.smoothness_loss(e)) > 0
    r = float(idn_losses.npe(1.0, e, g, mask))
    assert 0.0 <= r <= 1.0
    seq = float(idn_losses.sparse_l1_seq([e, e], [g, g], [mask, mask]))
    np.testing.assert_allclose(seq, l1, rtol=1e-6)


def test_input_padder():
    x = RNG.standard_normal((1, 37, 45, 3)).astype(np.float32)
    p = InputPadder(x.shape[1:3], div=8, mode="sintel")
    (padded,) = p.pad(x)
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    back = p.unpad(padded)
    np.testing.assert_array_equal(back, x)


def test_setup_seed():
    setup_seed(7)
    a = np.random.rand(3)
    setup_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_debug_panels(tmp_path):
    pytest.importorskip("matplotlib")
    from cista_flow_tpu.data import show_flow, show_whole_img

    ev = RNG.standard_normal((1, 8, 10, 5)).astype(np.float32)
    img = RNG.random((1, 8, 10, 1)).astype(np.float32)
    p1 = str(tmp_path / "rec.png")
    show_whole_img(ev, img, img, path=p1)
    assert os.path.exists(p1)
    flow = RNG.standard_normal((1, 8, 10, 2)).astype(np.float32)
    p2 = str(tmp_path / "flow.png")
    show_flow(flow, flow, img, img, path=p2)
    assert os.path.exists(p2)


def test_combine_loss_and_metric():
    from cista_flow_tpu.losses.combine import CombineLoss, CombineMetric

    f1 = lambda o, t: (1.0, {"a": 1.0})
    f2 = lambda o, t: (2.0, {"b": 4.0})
    comb = CombineLoss([f1, f2], [1.0, 0.5])
    m = comb(None, None)
    assert m["loss"] == 2.0 and m["a"] == 1.0 and m["b"] == 4.0

    cm = CombineMetric([lambda o, t: {"epe": 1.0}, lambda o, t: {"px": 0.5}])
    r = cm.calculate(None, None)
    cm.push(r)
    cm.push({"epe": 3.0, "px": 0.7})
    text, summary = cm.summary()
    np.testing.assert_allclose(summary["epe"], 2.0)
    assert "epe" in text
    assert cm.get_all() == {}


def test_frontier_gate_is_one_sided():
    """frontier.within_gate admits points that BEAT the reference on a
    metric (improvement is never degradation) and rejects >gate slips in
    the harmful direction for each metric's own polarity."""
    from frontier import within_gate

    keys = ["psnr", "ssim", "epe"]
    ref = {"psnr": 23.45, "ssim": 0.792, "epe": 0.510}
    # 2% BETTER everywhere: higher psnr/ssim, lower epe -> admitted
    best = {"psnr": 23.92, "ssim": 0.808, "epe": 0.500}
    assert within_gate(best, ref, keys, 0.01)
    # 0.5% worse everywhere: within the 1% gate
    near = {"psnr": 23.33, "ssim": 0.788, "epe": 0.512}
    assert within_gate(near, ref, keys, 0.01)
    # epe 4% worse: rejected even with psnr/ssim flat
    slip = {"psnr": 23.45, "ssim": 0.792, "epe": 0.531}
    assert not within_gate(slip, ref, keys, 0.01)
    # psnr 2% lower: rejected
    dull = {"psnr": 22.98, "ssim": 0.792, "epe": 0.510}
    assert not within_gate(dull, ref, keys, 0.01)
