"""Composite CISTA-Flow parity vs the upstream reference, multi-step recurrence."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import add_reference_to_path
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.models import composite

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)


class Cfg:
    image_dim = (100, 172)
    num_bins = 5
    depth = 5
    base_channels = 64
    ds = 8
    is_bi = False
    warp_mode = "forward"
    model_mode = "cista-eraft"
    scale_factor = 0.5

    def default_flow_iters(self):
        return 3


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def j(x):
    return jnp.asarray(x)


@pytest.fixture(scope="module")
def ref_net():
    add_reference_to_path()
    from e2v.e2v_model import ERAFTCistaNet

    torch.manual_seed(0)
    net = ERAFTCistaNet(Cfg())
    net.eval()
    return net


def test_eraft_composite_three_steps(ref_net):
    """Full closed-loop recurrence: flow -> warp -> reconstruct, 3 steps."""
    rng = np.random.default_rng(11)
    B, H, W = 1, 100, 172
    cfg = Cfg()

    voxels = [rng.standard_normal((B, H, W, 5), dtype=np.float32)
              for _ in range(4)]

    params, model_state = ti.composite_params(ti.from_torch(ref_net),
                                              "cista-eraft")

    # torch reference loop (mirrors test_with_flow.py:145-149)
    rec_t = torch.zeros(B, 1, H, W)
    states_t = None
    refs = []
    with torch.no_grad():
        for s in range(3):
            batch = {"event_voxel_old": t(voxels[s]),
                     "event_voxel": t(voxels[s + 1]),
                     "rec_img0": rec_t}
            # reference ERAFT default iters=12; pass 3 via monkeypatched call
            flow = ref_net.event_flownet(image1=batch["event_voxel_old"],
                                         image2=batch["event_voxel"], iters=3)
            flow_final = flow["flow_final"]
            if flow_final.any():
                warped = ref_net.frame_warp.warp_frame(rec_t, flow_final)
                if states_t is not None:
                    down = torch.nn.functional.interpolate(
                        flow_final, scale_factor=0.5, mode="bilinear",
                        align_corners=True)
                    states_t[1] = ref_net.frame_warp.warp_frame(states_t[1], down)
            else:
                warped = rec_t
            rec_t, states_t = ref_net.cista_net(batch["event_voxel"], warped,
                                                states_t)
            refs.append(rec_t.numpy())

    # our loop
    state = composite.zero_state(B, cfg)
    rec = jnp.zeros((B, H, W, 1))
    for s in range(3):
        batch = {"event_voxel_old": j(voxels[s]),
                 "event_voxel": j(voxels[s + 1]),
                 "rec_img0": rec}
        rec, _, state, model_state = composite.apply(
            params, model_state, batch, state, cfg, iters=3)
        ref_nhwc = np.transpose(refs[s], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(rec), ref_nhwc,
                                   rtol=1e-3, atol=1e-3, err_msg=f"step {s}")


@pytest.fixture(scope="module")
def ref_eiflow_net():
    add_reference_to_path()
    from e2v.e2v_model import DCEIFlowCistaNet

    cfg = Cfg()
    cfg.model_mode = "cista-eiflow"
    torch.manual_seed(3)
    net = DCEIFlowCistaNet(cfg)
    net.eval()
    return net


def test_eiflow_composite_three_steps(ref_eiflow_net):
    """cista-eiflow closed loop: DCEIFlow(events, rec_prev) -> warp ->
    CISTA-LSTC, 3 recurrent steps (ref: e2v/e2v_model.py:138-196)."""
    ref_net = ref_eiflow_net
    rng = np.random.default_rng(21)
    B, H, W = 1, 100, 172
    cfg = Cfg()
    cfg.model_mode = "cista-eiflow"

    voxels = [rng.standard_normal((B, H, W, 5), dtype=np.float32)
              for _ in range(3)]

    params, model_state = ti.composite_params(ti.from_torch(ref_net),
                                              "cista-eiflow")

    # torch reference loop (mirrors e2v_model.py:168-194 with iters=3,
    # matching the manual-dispatch pattern of the eraft test above)
    rec_t = torch.zeros(B, 1, H, W)
    states_t = None
    refs = []
    with torch.no_grad():
        for s in range(3):
            flow = ref_net.event_flownet(event_voxel=t(voxels[s]),
                                         image1=rec_t, iters=3)
            flow_final = flow["flow_final"]
            if flow_final.any():
                warped = ref_net.frame_warp.warp_frame(rec_t, flow_final)
                if states_t is not None:
                    down = torch.nn.functional.interpolate(
                        flow_final, scale_factor=0.5, mode="bilinear",
                        align_corners=True)
                    states_t[1] = ref_net.frame_warp.warp_frame(states_t[1],
                                                                down)
            else:
                warped = rec_t
            rec_t, states_t = ref_net.cista_net(t(voxels[s]), warped, states_t)
            refs.append(rec_t.numpy())

    state = composite.zero_state(B, cfg)
    rec = jnp.zeros((B, H, W, 1))
    for s in range(3):
        batch = {"event_voxel": j(voxels[s]), "rec_img0": rec}
        rec, _, state, model_state = composite.apply(
            params, model_state, batch, state, cfg, iters=3)
        ref_nhwc = np.transpose(refs[s], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(rec), ref_nhwc,
                                   rtol=1e-3, atol=1e-3, err_msg=f"step {s}")


def test_idnet_composite_three_steps_next_flow_chaining(ref_net):
    """cista-idnet closed loop incl. the next_flow -> flow_init chaining
    (ref: e2v/e2v_model.py:252-308 + test_with_flow.py:151-154)."""
    add_reference_to_path()
    import types

    from e2v.e2v_model import IDCistaNet

    cfg = Cfg()
    cfg.model_mode = "cista-idnet"
    torch.manual_seed(5)
    ref_idnet = IDCistaNet(cfg)
    ref_idnet.eval()

    rng = np.random.default_rng(23)
    B, H, W = 1, 100, 172
    voxels = [rng.standard_normal((B, H, W, 5), dtype=np.float32)
              for _ in range(3)]

    params, model_state = ti.composite_params(ti.from_torch(ref_idnet),
                                              "cista-idnet")

    rec_t = torch.zeros(B, 1, H, W)
    states_t = None
    flow_init_t = None
    refs = []
    with torch.no_grad():
        for s in range(3):
            flow = ref_idnet.event_flownet(event_bins=t(voxels[s]),
                                           flow_init=flow_init_t)
            flow_final = flow["flow_final"]
            if flow_final.any():
                warped = ref_idnet.frame_warp.warp_frame(rec_t, flow_final)
                if states_t is not None:
                    down = torch.nn.functional.interpolate(
                        flow_final, scale_factor=0.5, mode="bilinear",
                        align_corners=True)
                    states_t[1] = ref_idnet.frame_warp.warp_frame(
                        states_t[1], down)
            else:
                warped = rec_t
            rec_t, states_t = ref_idnet.cista_net(t(voxels[s]), warped,
                                                  states_t)
            flow_init_t = flow["next_flow"]
            refs.append(rec_t.numpy())

    state = composite.zero_state(B, cfg)
    rec = jnp.zeros((B, H, W, 1))
    flow_init = None
    for s in range(3):
        batch = {"event_voxel": j(voxels[s]), "rec_img0": rec}
        rec, batch_flow, state, model_state = composite.apply(
            params, model_state, batch, state, cfg, iters=1,
            flow_init=flow_init)
        flow_init = batch_flow["next_flow"]
        ref_nhwc = np.transpose(refs[s], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(rec), ref_nhwc,
                                   rtol=1e-3, atol=1e-3, err_msg=f"step {s}")


def test_gt_flow_mode(ref_net):
    """cista-gtflow: no flow net, GT flow drives the warps (train phase 1)."""
    rng = np.random.default_rng(12)
    B, H, W = 1, 100, 172
    cfg = Cfg()
    cfg.model_mode = "cista-gtflow"

    params = {"cista": ti.cista_lstc_params(ti.from_torch(ref_net.cista_net),
                                            prefix="")}
    ev = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    gt_flow = (rng.standard_normal((B, H, W, 2)) * 3).astype(np.float32)
    rec0 = rng.random((B, H, W, 1), dtype=np.float32)

    with torch.no_grad():
        warped = ref_net.frame_warp.warp_frame(t(rec0), t(gt_flow))
        ref, _ = ref_net.cista_net(t(ev), warped, None)

    state = composite.zero_state(B, cfg)
    rec, _, _, _ = composite.apply(
        params, {"flow": {}}, {"event_voxel": j(ev), "rec_img0": j(rec0)},
        state, cfg, batch_gt={"gt_flow": j(gt_flow)})
    np.testing.assert_allclose(np.asarray(rec),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-3)
