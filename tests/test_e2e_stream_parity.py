"""Ultimate integration parity: the complete streaming eval pipeline
(reader -> windowing -> runner -> composite model) vs the upstream torch
pipeline at equal weights, frame by frame."""
import numpy as np
import pytest
import torch

from conftest import add_reference_to_path
from cista_flow_tpu.configs import Config
from cista_flow_tpu.data import ImageReader
from cista_flow_tpu.runner import Reconstructor

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)

cv2 = pytest.importorskip("cv2")

H, W = 128, 160  # coarsest ref pyramid level must be > 1x1 (div-by-zero)
RNG = np.random.default_rng(77)


def make_sequence_folder(root, n_frames=7, n_events=500):
    import os

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
        np.savez(os.path.join(root, f"events_{i:06d}.npz"),
                 t=t, x=RNG.integers(0, W, n_events),
                 y=RNG.integers(0, H, n_events),
                 p=RNG.integers(0, 2, n_events))
        np.savez(os.path.join(root, f"flow_{i:06d}.npz"),
                 flow01=RNG.standard_normal((2, H, W)).astype(np.float32),
                 flow10=RNG.standard_normal((2, H, W)).astype(np.float32))


def test_streaming_pipeline_matches_reference(tmp_path):
    add_reference_to_path()
    from data_readers.video_readers import ImageReader as RefReader
    from e2v.e2v_model import ERAFTCistaNet

    root = str(tmp_path / "seq")
    make_sequence_folder(root, n_frames=7, n_events=500)

    cfg = Config(image_dim=(H, W), model_mode="cista-eraft",
                 dataset="SIM", test_data_mode="upsampled", flow_iters=2)

    class RefCfg:
        image_dim = (H, W)
        num_bins = 5
        depth = 5
        base_channels = 64
        ds = 8
        is_bi = False
        warp_mode = "forward"
        time_unit = "s"
        is_forward_flow = False
        dataset = "SIM"

    torch.manual_seed(0)
    ref_model = ERAFTCistaNet(RefCfg())
    ref_model.eval()

    # our runner with the torch model's exact weights
    from cista_flow_tpu.ckpt import torch_import as ti

    recon = Reconstructor(cfg)
    recon.params, recon.model_state = ti.composite_params(
        ti.from_torch(ref_model), "cista-eraft")
    recon.reset()

    mine = ImageReader(cfg)
    mine.initialize(root, -1)
    ref_reader = RefReader(RefCfg(), device="cpu")
    ref_reader.initialize(root, -1)

    # reference streaming loop (mirrors test_with_flow.py:120-156).
    # NOTE: the protocol's all-zeros first voxel makes the instance-normed
    # encoders numerically CHAOTIC (0/0 noise amplified ~300x per norm), so
    # both implementations produce garbage-but-different first-step flow —
    # the reference eval skips warm-up frames for the same reason. For a
    # deterministic parity check we seed both sides with the same random
    # non-degenerate 'old' voxel.
    states = None
    prev_image = torch.zeros(1, 1, H, W)
    seed_old = RNG.standard_normal((5, H, W)).astype(np.float32)
    evs_old = torch.from_numpy(seed_old).unsqueeze(0)
    import jax.numpy as jnp
    recon.extra = jnp.asarray(seed_old.transpose(1, 2, 0))[None]
    step = 0
    while not mine.ending and not ref_reader.ending and step < 4:
        voxels_m, _, _, _ = mine.update_event_frame_flow_pack("upsampled")
        voxels_r, _, _, _ = ref_reader.update_event_frame_flow_pack("upsampled")

        for evs_m, evs_r in zip(voxels_m, voxels_r):
            rec_m, flow_m = recon.step(evs_m)

            t_evs = torch.from_numpy(evs_r).float().unsqueeze(0)
            with torch.no_grad():
                # reference ERAFT with matching iteration count
                flow = ref_model.event_flownet(image1=evs_old, image2=t_evs,
                                               iters=2)
                flow_final = flow["flow_final"]
                if flow_final.any():
                    warped = ref_model.frame_warp.warp_frame(prev_image,
                                                             flow_final)
                    if states is not None:
                        down = torch.nn.functional.interpolate(
                            flow_final, scale_factor=0.5, mode="bilinear",
                            align_corners=True)
                        states[1] = ref_model.frame_warp.warp_frame(
                            states[1], down)
                else:
                    warped = prev_image
                rec_r, states = ref_model.cista_net(t_evs, warped, states)
            prev_image = rec_r.clone()
            evs_old = t_evs.clone()

            np.testing.assert_allclose(
                rec_m, rec_r.numpy()[0, 0], rtol=1e-3, atol=1e-3,
                err_msg=f"frame {step}")
            np.testing.assert_allclose(
                flow_m, flow_final.numpy()[0], rtol=1e-3, atol=2e-3,
                err_msg=f"flow {step}")
            step += 1
    assert step >= 3


def _ref_cfg():
    class RefCfg:
        image_dim = (H, W)
        num_bins = 5
        depth = 5
        base_channels = 64
        ds = 8
        is_bi = False
        warp_mode = "forward"
        time_unit = "s"
        is_forward_flow = False
        dataset = "SIM"
        mixed_precision = False
    return RefCfg()


def test_streaming_pipeline_matches_reference_eiflow(tmp_path):
    """Full streaming pipeline parity for the flagship cista-eiflow: our
    reader + Reconstructor vs the upstream DCEIFlowCistaNet composite driven
    exactly like the reference eval loop (ref: test_with_flow.py:142-145,
    e2v/e2v_model.py:138-196), frame by frame at equal weights."""
    add_reference_to_path()
    from e2v.e2v_model import DCEIFlowCistaNet

    root = str(tmp_path / "seq")
    make_sequence_folder(root, n_frames=6, n_events=500)

    cfg = Config(image_dim=(H, W), model_mode="cista-eiflow", dataset="SIM",
                 test_data_mode="upsampled")

    torch.manual_seed(0)
    ref_model = DCEIFlowCistaNet(_ref_cfg())
    ref_model.eval()

    from cista_flow_tpu.ckpt import torch_import as ti

    recon = Reconstructor(cfg)
    recon.params, recon.model_state = ti.composite_params(
        ti.from_torch(ref_model), "cista-eiflow")
    recon.reset()

    # the protocol's all-zeros first rec_img0 makes the instance-normed
    # image encoder numerically chaotic (0/0 noise): seed both sides with
    # the same random non-degenerate previous frame (same reasoning as the
    # warm-up skip in the reference eval, test_with_flow.py:181)
    import jax.numpy as jnp
    seed_img = RNG.random((H, W)).astype(np.float32)
    recon.prev_image = jnp.asarray(seed_img)[None, ..., None]
    prev_image = torch.from_numpy(seed_img)[None, None]

    mine = ImageReader(cfg)
    mine.initialize(root, -1)
    from data_readers.video_readers import ImageReader as RefReader
    ref_reader = RefReader(_ref_cfg(), device="cpu")
    ref_reader.initialize(root, -1)

    states = None
    step = 0
    while not mine.ending and not ref_reader.ending and step < 3:
        voxels_m, _, _, _ = mine.update_event_frame_flow_pack("upsampled")
        voxels_r, _, _, _ = ref_reader.update_event_frame_flow_pack("upsampled")
        for evs_m, evs_r in zip(voxels_m, voxels_r):
            rec_m, flow_m = recon.step(evs_m)

            t_evs = torch.from_numpy(evs_r).float().unsqueeze(0)
            with torch.no_grad():
                rec_r, batch_flow, states = ref_model(
                    {"event_voxel": t_evs, "rec_img0": prev_image}, states)
            prev_image = rec_r.clone()

            np.testing.assert_allclose(
                rec_m, rec_r.numpy()[0, 0], rtol=1e-3, atol=2e-3,
                err_msg=f"frame {step}")
            np.testing.assert_allclose(
                flow_m, batch_flow["flow_final"].numpy()[0], rtol=1e-3,
                atol=5e-3, err_msg=f"flow {step}")
            step += 1
    assert step >= 3


def test_streaming_pipeline_matches_reference_idnet(tmp_path):
    """Full streaming pipeline parity for cista-idnet including the
    next_flow warm-start chaining the reference eval loop threads between
    steps (ref: test_with_flow.py:151-154, e2v/e2v_model.py:252-308)."""
    add_reference_to_path()
    pytest.importorskip("omegaconf")
    from e2v.e2v_model import IDCistaNet

    root = str(tmp_path / "seq")
    make_sequence_folder(root, n_frames=6, n_events=500)

    cfg = Config(image_dim=(H, W), model_mode="cista-idnet", dataset="SIM",
                 test_data_mode="upsampled")

    torch.manual_seed(0)
    ref_model = IDCistaNet(_ref_cfg())
    ref_model.eval()

    from cista_flow_tpu.ckpt import torch_import as ti

    recon = Reconstructor(cfg)
    recon.params, recon.model_state = ti.composite_params(
        ti.from_torch(ref_model), "cista-idnet")
    recon.reset()

    mine = ImageReader(cfg)
    mine.initialize(root, -1)
    from data_readers.video_readers import ImageReader as RefReader
    ref_reader = RefReader(_ref_cfg(), device="cpu")
    ref_reader.initialize(root, -1)

    states = None
    prev_image = torch.zeros(1, 1, H, W)
    flow_init = None
    step = 0
    while not mine.ending and not ref_reader.ending and step < 3:
        voxels_m, _, _, _ = mine.update_event_frame_flow_pack("upsampled")
        voxels_r, _, _, _ = ref_reader.update_event_frame_flow_pack("upsampled")
        for evs_m, evs_r in zip(voxels_m, voxels_r):
            rec_m, flow_m = recon.step(evs_m)

            t_evs = torch.from_numpy(evs_r).float().unsqueeze(0)
            with torch.no_grad():
                rec_r, batch_flow, states = ref_model(
                    {"event_voxel": t_evs, "rec_img0": prev_image}, states,
                    flow_init=flow_init)
            flow_init = batch_flow["next_flow"]
            prev_image = rec_r.clone()

            np.testing.assert_allclose(
                rec_m, rec_r.numpy()[0, 0], rtol=1e-3, atol=2e-3,
                err_msg=f"frame {step}")
            np.testing.assert_allclose(
                flow_m, batch_flow["flow_final"].numpy()[0], rtol=1e-3,
                atol=5e-3, err_msg=f"flow {step}")
            step += 1
    assert step >= 3


def test_streaming_pack_fix_windowing_matches_reference(tmp_path):
    """The test_wo_flow event-count windowing path: our reader's
    update_event_frame_pack_fix must emit the same voxel windows and frame
    pairing as the upstream reader (ref: data_readers/video_readers.py:145-234,
    consumed at test_wo_flow.py:124-161)."""
    add_reference_to_path()
    from data_readers.video_readers import ImageReader as RefReader

    root = str(tmp_path / "seq")
    make_sequence_folder(root, n_frames=7, n_events=400)

    cfg = Config(image_dim=(H, W), model_mode="cista-eraft", dataset="SIM",
                 test_data_mode="real", num_events=600)

    mine = ImageReader(cfg)
    mine.initialize(root, -1)
    ref_reader = RefReader(_ref_cfg(), device="cpu")
    ref_reader.initialize(root, -1)

    windows = 0
    while not mine.ending and not ref_reader.ending and windows < 6:
        voxels_m, frames_m, gt_m = mine.update_event_frame_pack_fix(
            cfg.num_events, mode="real")
        voxels_r, frames_r, gt_r = ref_reader.update_event_frame_pack_fix(
            600, mode="real")
        assert len(voxels_m) == len(voxels_r), f"window {windows}"
        for vm, vr in zip(voxels_m, voxels_r):
            np.testing.assert_allclose(np.asarray(vm), np.asarray(vr),
                                       rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(frames_m, dtype=np.float32),
                                   np.asarray(frames_r, dtype=np.float32),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gt_m, dtype=np.float32),
                                   np.asarray(gt_r, dtype=np.float32),
                                   rtol=1e-5, atol=1e-5)
        windows += 1
    assert windows >= 3
