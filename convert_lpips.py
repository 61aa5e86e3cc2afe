"""Convert torch LPIPS checkpoints to the .npz this framework loads.

The reference evaluates with ``lpips.LPIPS(net='alex')`` (ref:
utils/evaluate.py:45-68) and uses the same module as the training
perceptual term (ref: loss.py:307-343). This image has zero egress, so the
official weights cannot be fetched here — obtain them on a connected
machine and convert once:

  # Option A: a full lpips.LPIPS state_dict (torch.save(loss_fn.state_dict()))
  python convert_lpips.py --lpips-full lpips_alex_full.pth --out lpips_alex.npz

  # Option B: torchvision backbone state_dict + lpips linear-head checkpoint
  #   backbone: torchvision.models.alexnet(weights=...).state_dict()
  #   heads:    lpips/weights/v0.1/alex.pth from the official lpips repo
  python convert_lpips.py --backbone alexnet.pth --heads alex.pth --out lpips_alex.npz

Then hand the artifact to any CLI via the env var:

  CISTA_LPIPS=lpips_alex.npz python test_with_flow.py ...   # lpips eval metric
  CISTA_LPIPS=lpips_alex.npz python train.py ...            # perceptual term

(`CISTA_LPIPS_ALEX` / `CISTA_LPIPS_VGG` are also honored; a raw torch
state_dict path works too, but .npz needs no torch at load time.)
"""
from __future__ import annotations

import argparse

from cista_flow_tpu.losses import lpips as lpips_mod


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--lpips-full", default=None,
                    help="full lpips.LPIPS state_dict (net convs + lin heads)")
    ap.add_argument("--backbone", default=None,
                    help="torchvision backbone state_dict (alexnet/vgg16)")
    ap.add_argument("--heads", default=None,
                    help="lpips linear-heads checkpoint (lin{0..4} weights)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()

    if args.lpips_full is None and args.backbone is None:
        ap.error("pass --lpips-full or --backbone (+ --heads)")
    params = lpips_mod.load_torch_weights(
        alexnet_path=args.backbone, lpips_path=args.heads,
        lpips_full_path=args.lpips_full)
    n_convs, n_lins = len(params["convs"]), len(params["lins"])
    net = {5: "alex", 13: "vgg"}.get(n_convs, f"{n_convs}-conv")
    if n_lins != 5:
        raise SystemExit(
            f"expected 5 linear heads, got {n_lins} — wrong/partial checkpoint?")
    lpips_mod.save_npz(params, args.out)
    print(f"Wrote {args.out}: {net} backbone ({n_convs} convs, {n_lins} heads)")


if __name__ == "__main__":
    main()
