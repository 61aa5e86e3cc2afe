"""Self-contained quality loop on simulated event data: generate → train → eval.

The external benchmark datasets (ECD/HQF/MVSEC) and the released pretrained
weights are not shipped with the reference repo, so absolute metric parity
cannot be measured in-image. This script closes the quality loop END-TO-END
with in-repo physics instead: it synthesizes mutually-consistent
event/frame/flow sequences (``cista_flow_tpu/data/sim.py``, ESIM contrast
model), trains the reconstruction network from scratch through the real
train-CLI path (BPTT ``lax.scan``, phase schedule, ``.pth.tar`` saves), and
evaluates PSNR/SSIM on held-out simulated sequences through the real
eval-CLI path (streaming reader → windowed device-resident serving →
metrics). Every layer of the framework is exercised with data where the
right answer is known.

Usage (defaults fit one TPU chip in a few minutes):
    python sim_quality.py --workdir /tmp/simq [--epochs 40] [--dtype bfloat16]

Prints one JSON line: {"psnr_init", "psnr_trained", "ssim_init",
"ssim_trained", ...}. Expectation: psnr_trained >> psnr_init (an untrained
net emits ~flat gray). Ref quality protocol being mirrored:
/root/reference/test_with_flow.py:24-233 (metrics), train.py:27-269 (schedule).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cista_flow_tpu import configs
from cista_flow_tpu.data import sim


def ensure_eval_data(workdir, h, w, eval_frames, seed):
    """Deterministic held-out eval sequences (seeds disjoint from every
    training seed). Shared with gate_export.py / tests/test_quality_gate.py
    so the standing quality gate replays EXACTLY these sequences."""
    eval_dir = os.path.join(workdir, "eval")
    for s in range(2):
        sdir = os.path.join(eval_dir, f"sim_{s:02d}")
        if not os.path.exists(os.path.join(sdir, "timestamps.txt")):
            sim.write_eval_sequence(sdir, sim.simulate_sequence(
                seed + 777_000 + s, eval_frames, h, w))
    return eval_dir


def ensure_data(workdir, h, w, n_videos, n_frames, eval_frames, seed):
    train_dir = os.path.join(workdir, "train")
    idx = os.path.join(train_dir, "train_e2v_estflow.txt")
    if not os.path.exists(idx):
        print(f"generating training data ({n_videos} videos x {n_frames} "
              f"frames at {h}x{w})...")
        sim.write_train_dataset(train_dir, n_videos, n_frames, h, w,
                                seed=seed)
    eval_dir = ensure_eval_data(workdir, h, w, eval_frames, seed)
    return train_dir, eval_dir


def run_eval(workdir, eval_dir, h, w, dtype, ckpt=None, tag="init",
             model_mode="cista-gtflow", depth=5):
    from test_with_flow import evaluate_sequences

    cfg = configs.Config(
        model_mode=model_mode, image_dim=(h, w),
        is_gt_flow=(model_mode == "cista-gtflow"),
        path_to_test_data=eval_dir, test_data_mode="upsampled",
        output_folder=os.path.join(workdir, f"out_{tag}"),
        path_to_test_model=ckpt or "", dtype=dtype, depth=depth,
        is_write_image=True)
    results, keys = evaluate_sequences(cfg)
    mean = results[-1]
    return {k: float(v) for k, v in zip(keys, mean[1:1 + len(keys)])}


def main(argv=None):
    from cista_flow_tpu import compile_cache

    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/sim_quality")
    ap.add_argument("--image_dim", nargs=2, type=int, default=(180, 240))
    ap.add_argument("--n_videos", type=int, default=16)
    ap.add_argument("--n_frames", type=int, default=61)
    ap.add_argument("--eval_frames", type=int, default=30)
    ap.add_argument("--model_mode", default="cista-gtflow",
                    help="cista-gtflow (rec-only, GT flow) or a full "
                         "composite, e.g. cista-eiflow (3-phase schedule, "
                         "flow net trained from scratch, eval uses the "
                         "ESTIMATED flow and reports EPE)")
    ap.add_argument("--path_to_flownet", default="",
                    help="flow-net .pth.tar to start the composite from "
                         "(e.g. sim_flow_quality.py's output) — the "
                         "reference's full recipe: pretrain flow, then the "
                         "3-phase composite schedule (ref: train.py:69-79)")
    ap.add_argument("--flow_epoch", type=int, default=0)
    ap.add_argument("--rec_epoch", type=int, default=None,
                    help="default: epochs - flow_epoch (no phase-3)")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--len_sequence", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--depth", type=int, default=5,
                    help="CISTA ISTA depth to TRAIN at (reference default "
                         "5, ref: e2v/e2v_model.py:34-35). depth<5 trains "
                         "a serving-efficient flagship whose quality is "
                         "then compared against the depth-5 run's")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_train", action="store_true",
                    help="evaluate an existing checkpoint only")
    ap.add_argument("--load_epoch_for_train", type=int, default=0,
                    help="resume training from this saved epoch's .pth.tar "
                         "(ref: train.py:57-60 resume semantics)")
    args = ap.parse_args(argv)

    h, w = args.image_dim
    os.makedirs(args.workdir, exist_ok=True)
    train_dir, eval_dir = ensure_data(args.workdir, h, w, args.n_videos,
                                      args.n_frames, args.eval_frames,
                                      args.seed)

    # default flow_epoch=0 / rec_epoch=epochs puts the final save exactly at
    # the end of the run (the phase schedule is moot for cista-gtflow; for
    # composites pass --flow_epoch/--rec_epoch to exercise the 3 phases)
    rec_epoch = (args.epochs - args.flow_epoch if args.rec_epoch is None
                 else args.rec_epoch)
    tcfg = configs.Config(
        model_mode=args.model_mode, image_dim=(h, w),
        path_to_train_data=train_dir,
        path_to_model=os.path.join(args.workdir, "models"),
        epochs=args.epochs, flow_epoch=args.flow_epoch, rec_epoch=rec_epoch,
        batch_size=args.batch_size, len_sequence=args.len_sequence,
        lr=args.lr, depth=args.depth, dtype=args.dtype, remat=args.remat,
        shuffle=True, seed=args.seed, path_to_flownet=args.path_to_flownet,
        load_epoch_for_train=args.load_epoch_for_train)

    from cista_flow_tpu.runner import model_name_from_cfg
    mdl = model_name_from_cfg(tcfg)
    ckpt = os.path.join(args.workdir, "models", mdl,
                        f"{mdl}_{args.epochs}.pth.tar")

    metrics_init = run_eval(args.workdir, eval_dir, h, w, args.dtype,
                            ckpt=None, tag="init",
                            model_mode=args.model_mode, depth=args.depth)

    if not args.skip_train and not os.path.exists(ckpt):
        import train as train_cli
        train_cli.Trainer(tcfg).run()
    assert os.path.exists(ckpt), f"training did not produce {ckpt}"

    metrics_trained = run_eval(args.workdir, eval_dir, h, w, args.dtype,
                               ckpt=ckpt, tag="trained",
                               model_mode=args.model_mode,
                               depth=args.depth)

    out = {
        "psnr_init": round(metrics_init["psnr"], 3),
        "psnr_trained": round(metrics_trained["psnr"], 3),
        "ssim_init": round(metrics_init["ssim"], 4),
        "ssim_trained": round(metrics_trained["ssim"], 4),
        "mse_init": round(metrics_init["mse"], 6),
        "mse_trained": round(metrics_trained["mse"], 6),
        "epochs": args.epochs,
        "ckpt": ckpt,
    }
    if "epe" in metrics_trained:
        out["epe_init"] = round(metrics_init["epe"], 3)
        out["epe_trained"] = round(metrics_trained["epe"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
