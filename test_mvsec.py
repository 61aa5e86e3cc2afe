"""MVSEC evaluation: accumulate raw event chunks to ~num_events, voxelize,
reconstruct, report rec metrics + FWL.

Equivalent of the reference CLI (ref: test_mvsec.py). Reference quirks fixed
rather than replicated (documented in SURVEY.md §7): the upstream script
references undefined ``gt_image_norm`` and an unimported
``voxel_warping_flow_loss`` (ref: test_mvsec.py:179-180) — here the GT frame
is ``gt_img1`` and FWL is computed from the losses module.
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
from cista_flow_tpu.data import EvalWriter, FlowWriter, ImageWriter
from cista_flow_tpu.data.mvsec import MVSEC_NE, VALID_TIME_INDEX
from cista_flow_tpu.losses import fwl_metric, recon_evaluate
from cista_flow_tpu.losses import lpips as lpips_mod
from cista_flow_tpu.runner import Reconstructor

TEST_DATA_LIST = list(VALID_TIME_INDEX.keys())


def discover_mvsec(cfgs):
    """(ref: test_mvsec.py:47-68): find folders containing *_data.hdf5."""
    seq_paths, seq_names = [], []
    for folder_name in sorted(os.listdir(cfgs.path_to_test_data)):
        folder = os.path.join(cfgs.path_to_test_data, folder_name)
        if not os.path.isdir(folder):
            continue
        for data_file in os.listdir(folder):
            name = data_file.split(".")[0].split("_data")[0]
            if not os.path.isfile(os.path.join(folder, data_file)):
                continue
            if name in TEST_DATA_LIST and name not in seq_names:
                if cfgs.test_data_name is None or name == cfgs.test_data_name:
                    seq_paths.append(folder)
                    seq_names.append(name)
    return sorted(seq_paths), sorted(seq_names)


def evaluate(cfgs, dataset_factory=None):
    """dataset_factory(cfgs, path, name) -> MVSEC_NE-like dataset; injectable
    for testing with small synthetic fixtures."""
    recon = Reconstructor(cfgs)
    seq_paths, seq_names = discover_mvsec(cfgs)
    lpips_params = lpips_mod.params_from_env()

    all_seq_results, whole_mean = [], []
    num_total_frames = 0
    metric_keys = None

    for path, data_name in zip(seq_paths, seq_names):
        if dataset_factory is not None:
            ds = dataset_factory(cfgs, path, data_name)
        else:
            ds = MVSEC_NE(cfgs, data_root=path, data_split=data_name)
        recon.reset()
        image_writer = ImageWriter(cfgs, recon.model_name, data_name)
        eval_writer = EvalWriter(cfgs, recon.model_name, data_name)
        flow_writer = FlowWriter(cfgs, recon.model_name, data_name)

        results = []
        frame_idx = 0
        num_events_acc = 0
        events_acc = []
        print("data_length", len(ds))
        for batch_idx in range(len(ds)):
            if batch_idx >= cfgs.test_img_num:
                break
            raw_events_list, batch_gt = ds[batch_idx]
            rec = flow_final = evs = None

            windows = []
            for events, n_e in raw_events_list:
                num_events_acc += n_e
                events_acc.append(events)
                # accumulate to >= 0.8 * num_events before voxelizing
                # (ref: test_mvsec.py:147-160)
                if cfgs.num_events > 0 and num_events_acc < 0.8 * cfgs.num_events:
                    continue
                num_events_acc = 0
                windows.append(ds.events_to_voxel(
                    np.concatenate(events_acc, axis=0), ds.height, ds.width))
                events_acc = []

            # all completed windows of this batch in one device dispatch
            if windows:
                evs = windows[-1]
                rec, flow_final = recon.step_window(windows)

            if num_events_acc != 0 or rec is None:
                continue

            gt = batch_gt["gt_img1"][0]  # (H, W)
            rec_j = jnp.asarray(rec)[None, ..., None]
            gt_j = jnp.asarray(gt, jnp.float32)[None, ..., None]
            rec_metrics = {k: float(v) for k, v in
                           recon_evaluate(rec_j, gt_j, lpips_params).items()}
            evs_j = jnp.asarray(evs.transpose(1, 2, 0))[None]
            flow_j = jnp.asarray(flow_final.transpose(1, 2, 0))[None]
            fwl = float(fwl_metric(evs_j, flow_j))

            rec_u8 = rec - rec.min()
            rec_u8 = np.uint8(255 * rec_u8 / max(rec_u8.max(), 1e-8))
            if frame_idx == 0 or (frame_idx + 1) % 10 == 0:
                image_writer(rec_u8, frame_idx + 1)
                flow_writer(flow_final, frame_idx)

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
    parser = argparse.ArgumentParser()
    configs.add_args(parser)
    cfgs = configs.from_args(parser.parse_args())
    evaluate(cfgs)
