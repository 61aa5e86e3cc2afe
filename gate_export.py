"""Export the standing quality-gate anchor: trained checkpoint -> gate/.

Takes a trained flagship `.pth.tar` (sim_quality.py's output) and produces
the two committed artifacts of the standing quality regression gate:

* ``gate/flagship_sim40_f16.npz`` — the reference-layout state_dict
  (ref checkpoint layout: /root/reference/train.py:137-140) stored float16
  to keep the committed blob small; `ckpt.load_state_dict` upcasts on load.
* ``gate/targets_sim_eiflow.json`` — the gate-config eval metrics recorded
  from the f16 anchor itself (so the gate pins exactly what is committed,
  not the discarded f32 original), via ``eval_harness.py --save_targets``
  on deterministic held-out simulated sequences (sim_quality.ensure_data
  seeds).

``tests/test_quality_gate.py`` replays the same eval from the committed
anchor and fails on metric drift — the standing regression gate for the
whole serving stack (reader -> windowed device-resident serving -> model ->
metrics).

Usage:
    python gate_export.py --ckpt /tmp/simq3/models/.../..._40.pth.tar \
        [--workdir /tmp/gate_eval] [--gate_dir gate]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def export_npz(ckpt_path: str, out_path: str) -> dict:
    """Convert a .pth.tar (or .npz) state dict to an f16 .npz archive.

    Only floating-point tensors are downcast; integer bookkeeping entries
    keep their dtype. Any float tensor whose values would overflow f16
    (|x| > 65504, e.g. BN running_var outliers) stays f32 — `np.load`
    round-trips mixed dtypes fine and `ckpt.load_state_dict` upcasts.
    """
    from cista_flow_tpu.ckpt import torch_import

    sd = torch_import.load_state_dict(ckpt_path)
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if not np.issubdtype(v.dtype, np.floating):
            out[k] = v
            continue
        f16 = v.astype(np.float16)
        if np.isfinite(f16).all() == np.isfinite(v).all():
            out[k] = f16
        else:  # f16 overflow — keep this entry at full precision
            print(f"gate_export: keeping {k} f32 (f16 overflow)")
            out[k] = v.astype(np.float32)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez_compressed(out_path, **out)
    return out


def record_targets(npz_path: str, targets_path: str, eval_dir: str,
                   model_mode: str = "cista-eiflow",
                   dtype: str = "float32", workdir: str = "/tmp/gate_eval",
                   extra_args=()) -> None:
    import eval_harness

    eval_harness.main([
        "--harness_mode", "with_flow",
        "--model_mode", model_mode,
        "--image_dim", "180", "240",
        "--path_to_test_data", eval_dir,
        "--test_data_mode", "upsampled",
        "--path_to_test_model", npz_path,
        "--dtype", dtype,
        # keep eval frame/CSV artifacts out of the repo working tree
        "--output_folder", os.path.join(workdir, "out"),
        "--targets", targets_path,
        "--save_targets",
        *extra_args,
    ])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="trained flagship .pth.tar (sim_quality.py output)")
    ap.add_argument("--workdir", default="/tmp/gate_eval",
                    help="scratch dir for the regenerated held-out eval data")
    ap.add_argument("--gate_dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "gate"))
    ap.add_argument("--model_mode", default="cista-eiflow")
    ap.add_argument("--dtype", default="float32",
                    help="targets eval dtype (float32 = CPU-reproducible)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX CPU backend (targets recorded on "
                         "CPU f32 — exactly what tests/test_quality_gate.py "
                         "replays; also leaves the TPU free)")
    ap.add_argument("--stem", default="",
                    help="override the anchor/targets naming stem (e.g. "
                         "'flagship_ft3' for the depth-3 SERVING anchor; "
                         "targets land at targets_sim_<stem-suffix>.json)")
    ap.add_argument("--depth", type=int, default=None,
                    help="record targets at this serving ISTA depth "
                         "(checkpoints trained at reduced depth)")
    ap.add_argument("--flow_iters", type=int, default=None,
                    help="record targets at this serving GRU iteration "
                         "count (gate the admitted reduced point)")
    args = ap.parse_args(argv)

    if args.cpu:
        # the axon sitecustomize forces JAX_PLATFORMS at interpreter start;
        # env alone is not enough (same dance as tests/conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import sim_quality

    os.makedirs(args.workdir, exist_ok=True)
    eval_dir = sim_quality.ensure_eval_data(args.workdir, 180, 240,
                                            eval_frames=30, seed=0)

    # anchor naming: the flagship keeps its historical name; other composites
    # get per-variant anchors (gate/<variant>_sim40_f16.npz)
    variant = args.model_mode.split("-", 1)[-1]
    if args.stem:
        stem = f"{args.stem}_f16"
        targets_path = os.path.join(args.gate_dir,
                                    f"targets_sim_{args.stem}.json")
    else:
        stem = ("flagship_sim40_f16" if args.model_mode == "cista-eiflow"
                else f"{variant}_sim40_f16")
        targets_path = os.path.join(args.gate_dir,
                                    f"targets_sim_{variant}.json")
    npz_path = os.path.join(args.gate_dir, f"{stem}.npz")
    export_npz(args.ckpt, npz_path)
    print(f"wrote {npz_path} "
          f"({os.path.getsize(npz_path) / 1e6:.1f} MB)")
    extra = []
    if args.depth is not None:
        extra += ["--depth", str(args.depth)]
    if args.flow_iters is not None:
        extra += ["--flow_iters", str(args.flow_iters)]
    record_targets(npz_path, targets_path, eval_dir,
                   model_mode=args.model_mode, dtype=args.dtype,
                   workdir=args.workdir, extra_args=tuple(extra))
    with open(targets_path) as f:
        print("targets:", json.dumps(json.load(f)))


if __name__ == "__main__":
    main()
