"""The framework actually learns: training on synthetic moving-pattern data
improves held-out reconstruction PSNR (cista-gtflow mode, CPU-sized)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cista_flow_tpu import parallel
from cista_flow_tpu.configs import Config
from cista_flow_tpu.losses import psnr
from cista_flow_tpu.models import composite

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)

H, W = 32, 48


def synth_sequence(rng, t_len, batch, shift=2):
    """Moving smooth pattern: constant rightward flow; events = temporal
    brightness difference binned into a crude voxel."""
    xx = np.linspace(0, 4 * np.pi, W)[None, :]
    yy = np.linspace(0, 3 * np.pi, H)[:, None]
    seq = {"event_voxel": [], "gt_img0": [], "gt_img1": [], "gt_flow": []}
    for b in range(batch):
        phase = rng.uniform(0, np.pi)
        frames = [0.5 + 0.45 * np.sin(xx - shift * t * 2 * np.pi / W + phase)
                  * np.cos(yy) for t in range(t_len + 1)]
        for t in range(t_len):
            diff = frames[t + 1] - frames[t]
            voxel = np.stack([diff * (k + 1) / 5 for k in range(5)], -1)
            if b == 0 or True:
                pass
            seq["event_voxel"].append((t, b, voxel))
            seq["gt_img0"].append((t, b, frames[t][..., None]))
            seq["gt_img1"].append((t, b, frames[t + 1][..., None]))
            flow = np.zeros((H, W, 2), np.float32)
            flow[..., 0] = -shift  # pattern moves right => warp samples left
            seq["gt_flow"].append((t, b, flow))
    out = {}
    shapes = {"event_voxel": 5, "gt_img0": 1, "gt_img1": 1, "gt_flow": 2}
    for k, c in shapes.items():
        arr = np.zeros((t_len, batch, H, W, c), np.float32)
        for t, b, v in seq[k]:
            arr[t, b] = v
        out[k] = jnp.asarray(arr)
    return out


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["cista-eiflow", "cista-eraft",
                                  "cista-idnet"])
def test_training_improves_flow(mode):
    """Phase-1 training (train flow, freeze rec, GT flow to CISTA) lowers
    held-out flow EPE on constant-translation synthetic data — for every
    flow family."""
    from cista_flow_tpu.models import dceiflow, eraft, idnet

    rng = np.random.default_rng(1)
    cfg = Config(image_dim=(H, W), model_mode=mode, len_sequence=3,
                 flow_iters=2)
    params, mstate = composite.init(jax.random.PRNGKey(1), cfg)
    opt = parallel.make_optimizer(3e-4)
    opt_state = opt.init(params)

    train_seq = synth_sequence(rng, 3, 2)
    eval_seq = synth_sequence(np.random.default_rng(98), 3, 1)
    if mode == "cista-eraft":
        for seq in (train_seq, eval_seq):
            old = jnp.concatenate([jnp.zeros_like(seq["event_voxel"][:1]),
                                   seq["event_voxel"][:-1]], axis=0)
            seq["event_voxel_old"] = old

    def eval_epe(params, mstate):
        vals = []
        for t in range(3):
            if mode == "cista-eiflow":
                out, _ = dceiflow.apply(
                    params["flow"], mstate["flow"],
                    eval_seq["event_voxel"][t], eval_seq["gt_img0"][t], cfg,
                    iters=2)
            elif mode == "cista-eraft":
                out, _ = eraft.apply(
                    params["flow"], mstate["flow"],
                    eval_seq["event_voxel_old"][t],
                    eval_seq["event_voxel"][t], cfg, iters=2)
            else:
                out = idnet.apply(params["flow"], eval_seq["event_voxel"][t],
                                  cfg)
            epe = jnp.linalg.norm(
                out["flow_final"] - eval_seq["gt_flow"][t], axis=-1)
            vals.append(float(jnp.mean(epe)))
        return np.mean(vals)

    before = eval_epe(params, mstate)
    step = parallel.make_train_step(cfg, opt, loss_mode="flow",
                                    fix_net_name="rec", use_gt_flow=True,
                                    donate=False)
    for _ in range(30):
        params, mstate, opt_state, loss = step(params, mstate, opt_state,
                                               train_seq)
    after = eval_epe(params, mstate)
    assert np.isfinite(after)
    # the frozen CISTA subtree must be untouched
    assert after < before * 0.7, (before, after)
    print(f"EPE before {before:.3f} px -> after {after:.3f} px")


@pytest.mark.slow
def test_training_improves_reconstruction():
    rng = np.random.default_rng(0)
    cfg = Config(image_dim=(H, W), model_mode="cista-gtflow", len_sequence=3)
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    opt = parallel.make_optimizer(3e-4)
    opt_state = opt.init(params)

    train_seq = synth_sequence(rng, 3, 2)
    eval_seq = synth_sequence(np.random.default_rng(99), 3, 1)

    def eval_psnr(params):
        state = composite.zero_state(1, cfg)
        rec = jnp.zeros((1, H, W, 1))
        vals = []
        for t in range(3):
            batch = {"event_voxel": eval_seq["event_voxel"][t],
                     "rec_img0": rec}
            rec, _, state, _ = composite.apply(
                params, mstate, batch, state, cfg,
                batch_gt={"gt_flow": eval_seq["gt_flow"][t]})
            vals.append(float(psnr(rec, eval_seq["gt_img1"][t])))
        return np.mean(vals)

    before = eval_psnr(params)
    step = parallel.make_train_step(cfg, opt, loss_mode="rec",
                                    fix_net_name=None, use_gt_flow=True,
                                    donate=False)
    for _ in range(30):
        params, mstate2, opt_state, loss = step(params, mstate, opt_state,
                                                train_seq)
    after = eval_psnr(params)
    assert np.isfinite(after)
    assert after > before + 1.0, (before, after)
    print(f"PSNR before {before:.2f} dB -> after {after:.2f} dB")
