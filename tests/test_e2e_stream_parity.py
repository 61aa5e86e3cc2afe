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
