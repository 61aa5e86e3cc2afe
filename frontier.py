"""Speed/quality frontier over the serving-time reduction knobs.

Two knobs, both pure serving-time truncations of the SAME trained
checkpoint, gated against the reference-default point:

* flow-net GRU iterations (ref: DCEIFlow/DCEIFlow.py:143 ``iters=6``;
  ERAFT/eraft.py:114 ``iters=12``) — fewer refinement steps.
* CISTA ISTA depth (ref: e2v/e2v_model.py:34-35 ``depth=5``) — the ISTA
  blocks are WEIGHT-TIED (one D/P/Lambda reused every iteration), so a
  smaller serving depth just truncates the sparse-code fixed-point
  iteration; no retraining, no checkpoint surgery.

Evaluates every (iters, depth) grid point through the real eval CLI
(windowed device-resident serving, PSNR/SSIM/EPE on held-out sequences)
and reports each point next to its measured throughput, plus which
reduced points stay within ``--gate`` (default 1%, BASELINE.json's
quality tolerance) of the reference-default metrics.

    python frontier.py --ckpt M.pth.tar --eval_dir EVAL \
        [--iters 2 3 4 6] [--depths 3 4 5] [--model_mode cista-eiflow] \
        [--bench]

Prints one JSON line: {"frontier": [{iters, depth, psnr, ssim, epe, fps?,
within_gate}, ...], "reference_iters": N, "reference_depth": D}.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cista_flow_tpu import configs


# direction of improvement per gated metric (psnr/ssim higher-better,
# epe lower-better)
_BETTER = {"psnr": 1.0, "ssim": 1.0, "epe": -1.0}


def within_gate(m, ref, keys, gate):
    """One-sided admission: only DEGRADATION relative to the reference
    point counts against a reduced point — beating the reference on a
    metric is never penalized. ``gate`` is the relative tolerance."""
    return all((m[k] - ref[k]) * _BETTER[k]
               >= -gate * max(abs(ref[k]), 1e-12) for k in keys)


def eval_point(args, iters, depth):
    from test_with_flow import evaluate_sequences

    cfg = configs.Config(
        model_mode=args.model_mode, image_dim=tuple(args.image_dim),
        is_gt_flow=False, path_to_test_data=args.eval_dir,
        test_data_mode="upsampled", flow_iters=iters, depth=depth,
        output_folder=os.path.join(args.workdir,
                                   f"out_iters{iters}_d{depth}"),
        path_to_test_model=args.ckpt, dtype=args.dtype)
    results, keys = evaluate_sequences(cfg)
    mean = results[-1]
    assert mean[0] == "mean"
    return {k: float(v) for k, v in zip(keys, mean[1:1 + len(keys)])}


def bench_point(args, iters, depth):
    """Throughput at this grid point (bench.py in a subprocess: one
    clean jit cache per point)."""
    env = dict(os.environ, BENCH_ITERS=str(iters), BENCH_DEPTH=str(depth),
               BENCH_MODEL=args.model_mode, BENCH_DTYPE=args.dtype)
    env.pop("JAX_PLATFORMS", None)  # --cpu applies to quality evals only;
    #                                 fps is always measured on the chip
    if env.get("BENCH_DTYPE") == "float32":
        env["BENCH_DTYPE"] = "bfloat16"  # chip serving dtype
    out = subprocess.run([sys.executable,
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), "bench.py")],
                         env=env, capture_output=True, text=True, timeout=900)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return float(json.loads(line)["value"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--eval_dir", required=True,
                    help="held-out sequences (sim_quality.py eval layout)")
    ap.add_argument("--workdir", default="/tmp/frontier")
    ap.add_argument("--model_mode", default="cista-eiflow")
    ap.add_argument("--image_dim", nargs=2, type=int, default=(180, 240))
    ap.add_argument("--iters", nargs="+", type=int, default=[2, 3, 4, 6])
    ap.add_argument("--depths", nargs="+", type=int, default=[5],
                    help="serving ISTA depths to sweep (weight-tied; "
                         "reference default 5)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--gate", type=float, default=0.01,
                    help="relative tolerance vs the full-iteration point")
    ap.add_argument("--bench", action="store_true",
                    help="also measure fps per point (needs the chip)")
    ap.add_argument("--cpu", action="store_true",
                    help="run the QUALITY evals on the JAX CPU backend "
                         "(leaves the TPU free; use with --dtype float32 — "
                         "the bf16 serving fast paths are TPU-gated). "
                         "--bench subprocesses still measure on the chip.")
    args = ap.parse_args(argv)

    if args.cpu:
        # the axon sitecustomize forces JAX_PLATFORMS at interpreter start;
        # env alone is not enough (same dance as tests/conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    # AFTER the --cpu switch: enable() initializes the backend
    # (jax.default_backend()), which would lock the platform to the TPU
    # tunnel before the cpu config.update took effect
    from cista_flow_tpu import compile_cache
    compile_cache.enable()

    ref_iters, ref_depth = max(args.iters), max(args.depths)
    points = {}
    for it in sorted(args.iters, reverse=True):
        for d in sorted(args.depths, reverse=True):
            m = eval_point(args, it, d)
            points[(it, d)] = m
            print(f"iters={it} depth={d}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in m.items()))

    ref = points[(ref_iters, ref_depth)]
    gated_keys = [k for k in ("psnr", "ssim", "epe") if k in ref]
    rows = []
    for (it, d) in sorted(points):
        m = points[(it, d)]
        within = within_gate(m, ref, gated_keys, args.gate)
        row = {"iters": it, "depth": d, "within_gate": bool(within),
               **{k: round(m[k], 4) for k in gated_keys}}
        if args.bench:
            row["fps"] = bench_point(args, it, d)
        rows.append(row)

    print(json.dumps({"frontier": rows, "reference_iters": ref_iters,
                      "reference_depth": ref_depth,
                      "gate": args.gate, "model": args.model_mode}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
