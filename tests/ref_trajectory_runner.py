"""Torch half of the trajectory-equivalence test (see
test_train_trajectory.py). Runs the upstream reference trainer VERBATIM
(ref: train.py:180-232 semantics) on saved batches and writes per-step
losses + initial/final state_dicts to an npz.

Runs in a CLEAN subprocess with no JAX in the process: torch autograd's CPU
backward segfaults when the XLA CPU runtime is resident alongside it in this
image, and process isolation also guarantees the reference trainer sees the
plain upstream execution environment. This module must therefore import ONLY
numpy/torch (+ the reference); the jax-side test imports its constants from
here to stay in sync.
"""
import os
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

# Smallest dims where the reference stays NUMERICALLY DEFINED: the 4-level
# corr pyramid (hardcoded, ref raft_corr.py:16) bottoms out at padded/64, and
# torch grid_sample(align_corners=True) on a 1-extent axis divides by
# (size-1)=0 -> NaN flow (and a segfault in its CPU backward). Padded dims
# must therefore be >=128; H=120 keeps ImagePadder's pad/unpad in play.
#
# TRAJ_* env overrides exist for the fast-tier sentinel
# (test_train_sentinel.py), which launches this runner in a subprocess with
# a 2-optimizer-step spec; the slow full test uses the defaults.
H = int(os.environ.get("TRAJ_H", "120"))
W = int(os.environ.get("TRAJ_W", "128"))
T = int(os.environ.get("TRAJ_T", "3"))       # BPTT unroll (ref: 10), shrunk:
BATCH = int(os.environ.get("TRAJ_BATCH", "2"))  # CPU compile of each phase's
ITERS = int(os.environ.get("TRAJ_ITERS", "2"))  # BPTT graph dominates
FLOW_EPOCH = int(os.environ.get("TRAJ_FLOW_EPOCH", "2"))
REC_EPOCH = int(os.environ.get("TRAJ_REC_EPOCH", "2"))
EPOCHS = int(os.environ.get("TRAJ_EPOCHS", "8"))  # default: phases 1, 2,
LR = 1e-4                                         # 3-flow and 3-rec
SEED = 7


class TCfg:
    image_dim = (H, W)
    num_bins = 5
    depth = 5
    base_channels = 64
    ds = 8
    is_bi = False
    warp_mode = "forward"
    model_mode = "cista-eiflow"
    scale_factor = 0.5

    def default_flow_iters(self):
        return ITERS


class _FaithfulSSIM(torch.nn.Module):
    """pytorch_msssim's SSIM algorithm (gaussian 11/1.5, VALID padding,
    K1=0.01 K2=0.03, mean over the map) — the exact math the JAX side's
    losses/ssim.py implements. Differentiable."""

    def __init__(self, data_range=1.0):
        super().__init__()
        g = torch.exp(-((torch.arange(11, dtype=torch.float64) - 5) ** 2)
                      / (2 * 1.5 ** 2))
        self.register_buffer("g", (g / g.sum()).float())
        self.data_range = data_range

    def _blur(self, x):
        c = x.shape[1]
        kh = self.g.view(1, 1, 11, 1).expand(c, 1, 11, 1)
        kw = self.g.view(1, 1, 1, 11).expand(c, 1, 1, 11)
        return F.conv2d(F.conv2d(x, kh, groups=c), kw, groups=c)

    def forward(self, a, b):
        c1 = (0.01 * self.data_range) ** 2
        c2 = (0.03 * self.data_range) ** 2
        mu1, mu2 = self._blur(a), self._blur(b)
        s1 = self._blur(a * a) - mu1 * mu1
        s2 = self._blur(b * b) - mu2 * mu2
        s12 = self._blur(a * b) - mu1 * mu2
        cs = (2 * s12 + c2) / (s1 + s2 + c2)
        m = ((2 * mu1 * mu2 + c1) / (mu1 * mu1 + mu2 * mu2 + c1)) * cs
        return m.mean()


class _ZeroLPIPS(torch.nn.Module):
    """Inert LPIPS stand-in (torch assigns it as a child module, so it must
    BE an nn.Module). Matches the JAX side's behavior with no weights."""

    def forward(self, *a, **k):
        return torch.tensor(0.0)


def shim_ref_loss_deps():
    """Make the reference's loss.py importable (lpips / pytorch_msssim /
    skimage are absent from this image). The instances these shims produce
    are REPLACED with the faithful stand-ins after construction."""
    if "lpips" not in sys.modules:
        m = types.ModuleType("lpips")
        m.LPIPS = lambda net="alex": _ZeroLPIPS()
        sys.modules["lpips"] = m
    if "pytorch_msssim" not in sys.modules:
        m = types.ModuleType("pytorch_msssim")
        m.SSIM = lambda **kw: _FaithfulSSIM()
        sys.modules["pytorch_msssim"] = m
    if "skimage" not in sys.modules:
        m = types.ModuleType("skimage")
        mm = types.ModuleType("skimage.metrics")
        mm.structural_similarity = lambda *a, **k: 0.0
        m.metrics = mm
        sys.modules["skimage"] = m
        sys.modules["skimage.metrics"] = mm
    if "omegaconf" not in sys.modules:  # e2v_model imports it for idnet cfg
        shim = types.ModuleType("omegaconf")

        class _OmegaConf:
            @staticmethod
            def create(d):
                return types.SimpleNamespace(**d)

        shim.OmegaConf = _OmegaConf
        sys.modules["omegaconf"] = shim


def phase(epoch):
    """The reference's schedule (ref: train.py:116-129), torch-side."""
    if epoch < FLOW_EPOCH:
        return "rec", False, None          # fix rec, train flow
    if epoch < FLOW_EPOCH + REC_EPOCH:
        return "flow", True, None          # fix flow, train rec
    if (epoch - FLOW_EPOCH - REC_EPOCH) % 4 >= 2:
        return "flow", True, 3e-5
    return "rec", False, 3e-5


def save_batches(batches, path):
    flat = {"n": np.int64(len(batches))}
    for i, b in enumerate(batches):
        for k, v in b.items():
            flat[f"b{i}_{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_batches(path):
    z = np.load(path)
    n = int(z["n"])
    return [{k[len(f"b{i}_"):]: z[k] for k in z.files
             if k.startswith(f"b{i}_")} for i in range(n)]


def build_net():
    from e2v.e2v_model import DCEIFlowCistaNet

    torch.manual_seed(SEED)
    net = DCEIFlowCistaNet(TCfg())
    # reference default iters=6; shrink identically on both sides
    orig_fwd = net.event_flownet.forward
    net.event_flownet.forward = lambda **kw: orig_fwd(iters=ITERS, **kw)
    return net


def run_reference(net, batches):
    """The reference trainer loop verbatim (ref: train.py:180-232)."""
    from loss import FlowReconLoss
    from utils.flow_utils import FrameWarp

    warp = FrameWarp(mode="forward")
    loss_fn = FlowReconLoss((H, W), warp, ds=8, is_bi=False)
    loss_fn.reconstruction_loss_fn.ssim_loss_fn = _FaithfulSSIM()
    loss_fn.reconstruction_loss_fn.lpips_loss_fn = _ZeroLPIPS()

    opt = torch.optim.Adam(net.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, 10, 0.9)

    def step_dicts(batch):
        out = []
        for s in range(T):
            d = {"event_voxel": torch.from_numpy(np.ascontiguousarray(
                np.transpose(batch["event_voxel"][s], (0, 3, 1, 2))))}
            t = {k: torch.from_numpy(np.ascontiguousarray(
                np.transpose(batch[k][s], (0, 3, 1, 2))))
                for k in ("gt_img0", "gt_img1", "gt_flow")}
            out.append((d, t))
        return out

    losses = []
    for epoch in range(EPOCHS):
        fix, train_rec, lr_override = phase(epoch)
        if lr_override is not None:
            opt.param_groups[0]["lr"] = lr_override
        net.fix_params(net_name=fix)
        for batch in batches:
            loss = 0
            states, output = None, None
            cur_gt = dict([])
            for s, (cur_data, cur_target) in enumerate(step_dicts(batch)):
                if s == 0:
                    cur_data["rec_img0"] = torch.zeros_like(
                        cur_target["gt_img1"])
                    states = None
                else:
                    cur_data["rec_img0"] = output.clone()
                cur_gt["gt_img1"] = cur_target["gt_img1"].clone()
                if epoch < FLOW_EPOCH:
                    cur_gt["gt_flow"] = cur_target["gt_flow"].clone()
                output, batch_flow, states = net(cur_data, states, cur_gt)
                if train_rec:
                    loss_mode, is_consis = "rec", s >= 2
                else:
                    loss_mode, is_consis = "flow", False
                    if epoch >= FLOW_EPOCH + REC_EPOCH:
                        loss_mode = "both"
                loss = loss + loss_fn(output, cur_data["rec_img0"],
                                      batch_flow, cur_target, loss_mode,
                                      is_loss_consis=is_consis)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss))
        sched.step()
    return losses


def main(batches_path, out_path):
    sys.path.append("/root/reference")
    # pandas >= 2.2 shim is unnecessary here (no reference readers imported)
    shim_ref_loss_deps()
    net = build_net()
    init_sd = {k: v.detach().clone().numpy()
               for k, v in net.state_dict().items()}
    losses = run_reference(net, load_batches(batches_path))
    final_sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    np.savez(out_path, losses=np.asarray(losses, np.float64),
             **{"init__" + k: v for k, v in init_sd.items()},
             **{"final__" + k: v for k, v in final_sd.items()})
    print(f"reference run done: {len(losses)} steps")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
