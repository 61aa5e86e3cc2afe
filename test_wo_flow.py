"""Real-data evaluation (ECD/HQF): reconstruction metrics + FWL, no GT flow.

Equivalent of the reference CLI (ref: test_wo_flow.py): event-count windowing
(one GT frame may span several reconstructions), ECD GT percentile-normalized
(0-100), metrics = MSE/PSNR/SSIM(/LPIPS) + FWL, first 3 frames skipped.
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
from cista_flow_tpu.data import (
    EvalWriter,
    EventWriter,
    FlowWriter,
    ImageReader,
    ImageWriter,
    make_event_preview,
)
from cista_flow_tpu.losses import fwl_metric, recon_evaluate
from cista_flow_tpu.losses import lpips as lpips_mod
from cista_flow_tpu.runner import Reconstructor, discover_sequences
from cista_flow_tpu.utils import normalize_image


def evaluate_sequences(cfgs):
    recon = Reconstructor(cfgs)
    reader = ImageReader(cfgs)
    sequences = discover_sequences(cfgs.path_to_test_data)
    lpips_params = lpips_mod.params_from_env()

    all_seq_results, whole_mean = [], []
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
        event_writer = EventWriter(cfgs, recon.model_name, dataset_name)

        results = []
        frame_idx = 0
        while not reader.ending:
            voxels, _, gt_frame = reader.update_event_frame_pack_fix(
                cfgs.num_events, cfgs.test_data_mode)
            # whole window in one device dispatch (lax.scan); only the final
            # step's outputs feed the metrics/writers below
            if voxels:
                rec, flow_final = recon.step_window(voxels)
                evs = voxels[-1]

            gt = gt_frame
            if cfgs.dataset == "ECD":
                gt = normalize_image(gt, 0, 100)
            rec_j = jnp.asarray(rec)[None, ..., None]
            gt_j = jnp.asarray(gt, jnp.float32)[None, ..., None]
            rec_metrics = {k: float(v) for k, v in
                           recon_evaluate(rec_j, gt_j, lpips_params).items()}
            evs_j = jnp.asarray(evs.transpose(1, 2, 0))[None]
            flow_j = jnp.asarray(flow_final.transpose(1, 2, 0))[None]
            fwl = float(fwl_metric(evs_j, flow_j))

            image_writer(np.uint8(rec * 255.0), frame_idx + 1)
            flow_writer(flow_final, frame_idx)
            event_writer(make_event_preview(evs, mode="red-blue"), frame_idx)

            if frame_idx >= 3:
                if metric_keys is None:
                    metric_keys = list(rec_metrics.keys()) + ["FWL"]
                results.append(list(rec_metrics.values()) + [fwl])
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
