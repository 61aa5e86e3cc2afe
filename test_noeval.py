"""No-GT inference (HS-ERGB, raw DVS streams): write reconstructions only.

Equivalent of the reference CLI (ref: test_noeval.py): raw event streams via
FixedSizeEventReader (single file) or per-frame npz folders, inline
voxelization with hot-pixel filtering, 180-degree rotation for Samsung DVS,
frames written every 5th reconstruction.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cista_flow_tpu import configs
from cista_flow_tpu.data import (
    EventWriter,
    FixedSizeEventReader,
    FlowWriter,
    ImageWriter,
    SingleEventReaderNpz,
    make_event_preview,
)
from cista_flow_tpu.events import event_preprocess, events_to_voxel_grid
from cista_flow_tpu.runner import Reconstructor, discover_sequences


def run(cfgs):
    recon = Reconstructor(cfgs)
    if os.path.isdir(cfgs.path_to_test_data):
        sequences = discover_sequences(cfgs.path_to_test_data) or \
            [cfgs.path_to_test_data]
    else:
        sequences = [cfgs.path_to_test_data]

    for path in sequences:
        dataset_name = os.path.basename(path).split(".")[0]
        if cfgs.test_data_name is not None and dataset_name != cfgs.test_data_name:
            continue
        print(dataset_name)

        if os.path.isdir(path):
            paths = []
            for root, _, files in os.walk(path):
                for name in files:
                    if name.split(".")[-1] == "npz" or name in (
                            "events.txt", "events.zip", "events.csv"):
                        paths.append(os.path.join(root, name))
            paths.sort()
            iterator = SingleEventReaderNpz(paths)
        else:
            iterator = FixedSizeEventReader(path, cfgs.num_events,
                                            cfgs.k_shift, cfgs.n_event_skip)

        image_writer = ImageWriter(cfgs, recon.model_name, dataset_name)
        flow_writer = FlowWriter(cfgs, recon.model_name, dataset_name)
        event_writer = EventWriter(cfgs, recon.model_name, dataset_name)
        recon.reset()

        h, w = cfgs.image_dim
        frame_idx = 0
        chunk_len = 8  # frames per device dispatch (scan), amortizes syncs
        done = False
        while not done:
            voxels = []
            for window in iterator:
                voxel = events_to_voxel_grid(window, cfgs.num_bins, w, h)
                voxel = event_preprocess(voxel, filter_hot_pixel=True)
                if cfgs.dvs == "samsung":
                    # 180-degree rotation (ref: test_noeval.py:142-143)
                    voxel = voxel[:, ::-1, ::-1].copy()
                voxels.append(voxel)
                if len(voxels) == chunk_len:
                    break
            else:
                done = True
            if frame_idx + len(voxels) > cfgs.test_img_num + 1:
                voxels = voxels[:cfgs.test_img_num + 1 - frame_idx]
                done = True
            if not voxels:
                break

            recs, flows = recon.step_window(voxels, return_all=True)

            for i, (rec, flow_final, voxel) in enumerate(
                    zip(recs, flows, voxels)):
                fi = frame_idx + i
                if fi == 1 or fi % 5 == 0:
                    image_writer(np.uint8(rec * 255.0), fi + 1)
                    event_writer(make_event_preview(voxel, mode="grayscale"),
                                 fi)
                    flow_writer(flow_final, fi)
            frame_idx += len(voxels)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    configs.add_args(parser)
    cfgs = configs.from_args(parser.parse_args())
    # dataset-specific dims (ref: test_noeval.py:184-187)
    if cfgs.path_to_test_data and \
            cfgs.path_to_test_data.rstrip("/").split("/")[-1] == "240fps":
        cfgs.image_dim = (180, 320)
    if cfgs.dvs == "samsung":
        cfgs.image_dim = (480, 640)
    run(cfgs)
