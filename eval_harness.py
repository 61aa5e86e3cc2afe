"""Quality-target harness: run an eval CLI and gate metrics against targets.

Closes the loop on BASELINE.json's quality north star ("PSNR/SSIM/LPIPS
within 1% of the PyTorch reference on ECD and HQF") for when the real
datasets are mounted:

1. Run the upstream torch code on the dataset, record its mean metrics into
   a targets JSON (or run this harness once with --save_targets against a
   known-good configuration).
2. Run this harness; it executes the selected eval CLI end-to-end and exits
   nonzero if any targeted metric deviates beyond --harness_tolerance
   (relative, default 1%).

Examples:
  python eval_harness.py --harness_mode wo_flow --dataset ECD \\
      --path_to_test_data DATA --path_to_test_model M.pth.tar \\
      --num_events 15000 --targets targets_ecd.json
  python eval_harness.py ... --save_targets   # write current means instead

Lower-is-better metrics (mse, lpips) and higher-is-better (psnr, ssim, FWL)
are both gated by symmetric relative deviation.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cista_flow_tpu import configs


def mean_metrics(results, keys) -> dict:
    """Extract the 'mean' row as {metric: value}."""
    row = results[-1]
    assert row[0] == "mean"
    return {k: float(v) for k, v in zip(keys, row[1:1 + len(keys)])}


def compare(measured: dict, targets: dict, tolerance: float,
            atol: float = 1e-3):
    """Returns (ok, lines): symmetric relative deviation per shared metric.

    ``atol`` floors the denominator so near-zero targets (e.g. the 3px/5px
    outlier fractions pinned at exactly 0.0) don't make the relative gate
    degenerate — without it a single pixel crossing the threshold would
    register as a ~1e9 relative deviation and hard-fail regardless of
    tolerance. With the floor, a target of 0 admits |measured| up to
    atol*tolerance (one-in-~100k pixels at the defaults) and still fails on
    any genuine outlier-rate regression."""
    lines, ok = [], True
    for k, tv in targets.items():
        if k not in measured:
            lines.append(f"  {k}: target {tv} — MISSING from run")
            ok = False
            continue
        mv = measured[k]
        rel = abs(mv - tv) / max(abs(tv), atol)
        status = "ok" if rel <= tolerance else "FAIL"
        if rel > tolerance:
            ok = False
        lines.append(f"  {k}: measured {mv:.6f} vs target {tv:.6f} "
                     f"(rel dev {rel * 100:.2f}%) {status}")
    return ok, lines


def main(argv=None):
    parser = argparse.ArgumentParser(description="eval quality harness")
    configs.add_args(parser)
    parser.add_argument("--harness_mode", required=True,
                        choices=["with_flow", "wo_flow", "mvsec"])
    parser.add_argument("--targets", required=True,
                        help="targets JSON path ({metric: value})")
    parser.add_argument("--save_targets", action="store_true",
                        help="write current means to --targets and exit 0")
    parser.add_argument("--harness_tolerance", type=float, default=0.01)
    args = parser.parse_args(argv)
    cfgs = configs.from_args(args)

    if args.harness_mode == "with_flow":
        from test_with_flow import evaluate_sequences
    elif args.harness_mode == "wo_flow":
        from test_wo_flow import evaluate_sequences
    else:
        from test_mvsec import evaluate as evaluate_sequences

    results, keys = evaluate_sequences(cfgs)
    measured = mean_metrics(results, keys)

    if args.save_targets:
        with open(args.targets, "w") as f:
            json.dump(measured, f, indent=2)
        print(f"wrote targets to {args.targets}: {measured}")
        return 0

    with open(args.targets) as f:
        targets = json.load(f)
    ok, lines = compare(measured, targets, args.harness_tolerance)
    print(f"Quality gate (tolerance {args.harness_tolerance * 100:.1f}%):")
    print("\n".join(lines))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
