"""Training-throughput benchmark: the compiled BPTT train step on the chip.

Measures frames/s/chip of the real phase train step (the same
``parallel.make_train_step`` graph the train CLI runs: full T-step
``lax.scan`` unroll, one Adam update per sequence) on synthetic data, with
the knobs that move training cost:

    python train_bench.py [--batch 16] [--len_sequence 10] [--remat]
                          [--phase flow|rec|both] [--lpips off|random|<npz>]
                          [--model cista-eiflow] [--dtype bfloat16]

``--lpips random`` runs the perceptual term with randomly initialized
AlexNet-LPIPS weights — quality-meaningless but cost-exact, for measuring
the term's compile/memory/throughput impact without the (egress-blocked)
pretrained weights (ref training uses it by default: loss.py:307,340).

Prints one JSON line {"train_fps", "ms_per_step", ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    from cista_flow_tpu import compile_cache

    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--len_sequence", type=int, default=10)
    ap.add_argument("--image_dim", nargs=2, type=int, default=(180, 240))
    ap.add_argument("--model", default="cista-eiflow")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true", default=True)
    ap.add_argument("--no_remat", dest="remat", action="store_false")
    ap.add_argument("--phase", default="flow",
                    help="flow (phase 2: fix flow, train rec) | rec "
                         "(phase 1: fix rec, train flow, GT flow) | both "
                         "(phase 3 alternation, rec arm)")
    ap.add_argument("--lpips", default="off",
                    help="off | random | path to a converted LPIPS .npz")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args(argv)

    from cista_flow_tpu import configs, parallel
    from cista_flow_tpu.models import composite
    from cista_flow_tpu.losses import lpips as lpips_mod

    h, w = args.image_dim
    cfg = configs.Config(model_mode=args.model, image_dim=(h, w),
                         dtype=args.dtype, batch_size=args.batch,
                         len_sequence=args.len_sequence, remat=args.remat)

    lpips_params = None
    if args.lpips == "random":
        lpips_params = lpips_mod.init(jax.random.PRNGKey(1), net="alex")
    elif args.lpips not in ("", "off"):
        lpips_params = lpips_mod.load_weights(args.lpips)

    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    opt = parallel.make_optimizer(cfg.lr)
    opt_state = opt.init(params)

    # phase → (fix_net_name, loss_mode, use_gt_flow), as train.phase_for_epoch
    fix, loss_mode, use_gt = {
        "rec": ("rec", "flow", True),
        "flow": ("flow", "rec", False),
        "both": ("rec", "both", False),
    }[args.phase]
    step = parallel.make_train_step(cfg, opt, loss_mode, fix, use_gt,
                                    lpips_params=lpips_params, donate=False,
                                    remat=args.remat)

    T, B = args.len_sequence, args.batch
    rng = np.random.default_rng(0)
    cdt = np.float32
    seq = {
        "event_voxel": rng.standard_normal((T, B, h, w, cfg.num_bins)),
        "gt_img0": rng.random((T, B, h, w, 1)),
        "gt_img1": rng.random((T, B, h, w, 1)),
        "gt_flow": rng.standard_normal((T, B, h, w, 2)),
    }
    if args.model == "cista-eraft":
        seq["event_voxel_old"] = rng.standard_normal(
            (T, B, h, w, cfg.num_bins))
    seq = {k: jnp.asarray(v.astype(cdt)) for k, v in seq.items()}

    def force(x):
        # honest sync: scalar readback (block_until_ready returns early
        # through the axon tunnel — see PERF.md preamble)
        return float(jnp.sum(x.astype(jnp.float32)))

    t0 = time.perf_counter()
    params, mstate, opt_state, loss = step(params, mstate, opt_state, seq)
    force(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, mstate, opt_state, loss = step(params, mstate, opt_state, seq)
    force(loss)
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "metric": "train_frames_per_sec",
        "train_fps": round(T * B / dt, 1),
        "ms_per_step": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "loss": round(float(loss), 4),
        "model": args.model, "phase": args.phase, "batch": B, "T": T,
        "remat": args.remat, "lpips": args.lpips, "dtype": args.dtype,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
