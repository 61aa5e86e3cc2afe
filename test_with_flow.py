"""Simulated-data evaluation with GT flow: reconstruction + flow metrics.

Equivalent of the reference CLI (ref: test_with_flow.py): stream each
sequence, reconstruct every event window, evaluate PSNR/SSIM/MSE(/LPIPS) and
photometric/EPE/outlier flow metrics against GT, write per-sequence
result.csv + aggregate all.csv. First 3 frames skipped from stats
(ref: test_with_flow.py:181).
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from cista_flow_tpu import configs
from cista_flow_tpu.data import EvalWriter, FlowWriter, ImageReader, ImageWriter
from cista_flow_tpu.losses import flow_evaluate, recon_evaluate
from cista_flow_tpu.losses import lpips as lpips_mod
from cista_flow_tpu.runner import Reconstructor, discover_sequences


def evaluate_sequences(cfgs):
    recon = Reconstructor(cfgs)
    reader = ImageReader(cfgs)
    sequences = discover_sequences(cfgs.path_to_test_data)
    lpips_params = lpips_mod.params_from_env()

    all_seq_results = []
    whole_mean = []
    num_total_frames = 0
    metric_keys = None

    for path in sequences:
        dataset_name = os.path.basename(path).split(".")[0]
        if cfgs.test_data_name is not None and dataset_name != cfgs.test_data_name:
            continue
        reader.initialize(path, cfgs.test_img_num)
        recon.reset()

        image_writer = ImageWriter(cfgs, recon.model_name, dataset_name)
        eval_writer = EvalWriter(cfgs, recon.model_name, dataset_name)
        flow_writer = FlowWriter(cfgs, recon.model_name, dataset_name)

        results = []
        frame_idx = 0
        while not reader.ending:
            voxels, frame_pack, gt_frame, flows = \
                reader.update_event_frame_flow_pack(mode=cfgs.test_data_mode)
            # whole window in one device dispatch (lax.scan) instead of one
            # host sync per sub-frame — the metrics below only read the
            # final step (matching the reference loop's semantics)
            n = min(len(voxels), len(frame_pack), len(flows))
            rec, flow_final = recon.step_window(
                voxels[:n], flows[:n], use_gt_flow=cfgs.is_gt_flow)
            gt_prev = frame_pack[n - 1]
            gt_next = frame_pack[n] if n < len(frame_pack) else gt_frame
            gt_flow = flows[n - 1]

            target = {
                "gt_img0": jnp.asarray(gt_prev, jnp.float32)[None, ..., None],
                "gt_img1": jnp.asarray(gt_next, jnp.float32)[None, ..., None],
                "gt_flow": jnp.asarray(
                    gt_flow.transpose(1, 2, 0), jnp.float32)[None],
            }
            rec_j = jnp.asarray(rec)[None, ..., None]
            rec_metrics = {k: float(v) for k, v in recon_evaluate(
                rec_j, target["gt_img1"], lpips_params).items()}
            flow_j = jnp.asarray(flow_final.transpose(1, 2, 0))[None]
            flow_metrics = {k: float(v) for k, v in flow_evaluate(
                flow_j, target, cfgs).items()}

            image_writer(np.uint8(rec * 255.0), frame_idx + 1)
            flow_writer(flow_final, frame_idx)

            if frame_idx >= 3:
                metrics = {**rec_metrics, **flow_metrics}
                if metric_keys is None:
                    metric_keys = list(metrics.keys())
                results.append(list(metrics.values()))
            frame_idx += 1

        results = np.array(results)
        mean_results = results.mean(0)
        row = [eval_writer.dataset_name] + \
            list(np.round(mean_results, 4)) + [len(results)]
        all_seq_results.append(row)
        whole_mean.append(mean_results)
        num_total_frames += len(results)
        pretty = " ".join(f"{k}: {v:.4f}," for k, v in
                          zip(metric_keys, mean_results))
        print(f"\nTest set {eval_writer.dataset_name}: Average results for "
              f"{len(results)} frames: {pretty}\n")
        eval_writer(["Dataset"] + metric_keys + ["N_frames"], row)

    mean_all = np.array(whole_mean).mean(0)
    pretty = " ".join(f"{k}: {v:.4f}," for k, v in zip(metric_keys, mean_all))
    print(f"\n Average results for {num_total_frames} frames: {pretty}\n")
    all_seq_results.append(["mean"] + list(np.round(mean_all, 4))
                           + [num_total_frames])

    if cfgs.test_data_name is None:
        out_dir = os.path.join(cfgs.output_folder, recon.model_name)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "all.csv"), "a+", newline="") as f:
            w = csv.writer(f, delimiter="\t")
            w.writerow(["Dataset"] + metric_keys + ["N_frames"])
            w.writerows(all_seq_results)
    return all_seq_results, metric_keys


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="testing options")
    configs.add_args(parser)
    cfgs = configs.from_args(parser.parse_args())
    evaluate_sequences(cfgs)
