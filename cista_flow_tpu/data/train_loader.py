"""Training sequence dataset + batching loader (host side).

Equivalent of ``TrainfusedEventData`` (ref: data_readers/train_data_loaders.py):
index txt lines -> per-sequence lists of per-step dicts (event voxel,
GT frames, GT flow). Two grouping policies: by video id (``len_sequence>0``)
or event-count regrouping (``split_sequences_keep_org_seq``).

TPU addition: ``stacked=True`` yields dicts of (T, B, H, W, C) NHWC arrays
trimmed/padded to ``len_sequence`` — the static-shape input for the
``lax.scan`` BPTT train step. A thread pool overlaps decode with device
compute.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..events import event_preprocess, events_to_voxel_grid

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class TrainSequenceDataset:
    """Parses ``train_e2v_estflow.txt``:
    ``seq_id num_events ts0 ts1 img0 img1 events flow`` per line
    (ref: train_data_loaders.py:15-17,51-60)."""

    def __init__(self, train_data_txt, cfgs):
        self.root = cfgs.path_to_train_data
        self.num_bins = cfgs.num_bins
        self.height, self.width = cfgs.image_dim
        self.limit_num_events = cfgs.num_events
        self.len_sequence = cfgs.len_sequence
        self.is_reverse_events = cfgs.is_reverse_events
        self.is_bi = cfgs.is_bi
        self.model_mode = cfgs.model_mode

        # GT flow is backward-warp based; forward warping flips name + sign
        # (ref: train_data_loaders.py:31-38)
        if cfgs.is_forward_flow:
            self.flow_name, self.flow_name_bw = "flow01", "flow10"
        else:
            self.flow_name, self.flow_name_bw = "flow10", "flow01"
        self.flow_coef = -1 if cfgs.warp_mode == "forward" else 1

        self.video_cnt, self.num_events_list = [], []
        self.image_paths, self.next_image_paths = [], []
        self.event_paths, self.flow_paths = [], []
        with open(train_data_txt, "rb") as f:
            for line in f:
                s = line.strip().split()
                if not s:
                    continue
                self.video_cnt.append(int(s[0]))
                self.num_events_list.append(int(s[1]))
                self.image_paths.append(s[4].decode())
                self.next_image_paths.append(s[5].decode())
                self.event_paths.append(s[6].decode())
                self.flow_paths.append(s[7].decode())

        if self.len_sequence > 0:
            self._split_sequences()
        else:
            self._split_sequences_keep_org_seq()

    def __len__(self):
        return len(self.sequence_line_id)

    def _split_sequences(self):
        """Group consecutive lines by video id (ref: train_data_loaders.py:71-83)."""
        prev_video_id = -1
        self.sequence_line_id = []
        cur = []
        for line_id, video_id in enumerate(self.video_cnt):
            if video_id != prev_video_id and video_id != 0:
                if cur:
                    self.sequence_line_id.append(cur)
                cur = []
                prev_video_id = video_id
            cur.append(line_id)
        if cur:
            self.sequence_line_id.append(cur)

    def _split_sequences_keep_org_seq(self):
        """Regroup lines so each reconstruction reaches ~limit_num_events
        (ref: train_data_loaders.py:86-118). Each item is a list of
        per-reconstruction line-id groups."""
        prev_video_id = -1
        total = 0
        self.sequence_line_id = []
        group, seq = [], []
        single = 0
        for line_id, video_id in enumerate(self.video_cnt):
            if video_id != prev_video_id and video_id != 0:
                if group:
                    seq.append(group)
                if seq:
                    self.sequence_line_id.append(seq)
                seq, group = [], []
                prev_video_id = video_id
                total, single = 0, 0
            total += self.num_events_list[line_id]
            group.append(line_id)
            single += 1
            if total >= self.limit_num_events or (
                    single == 1 and total > 0.8 * self.limit_num_events):
                seq.append(group)
                total, single = 0, 0
                group = []
        if seq:
            self.sequence_line_id.append(seq)

    # -- decoding -------------------------------------------------------------

    def _load_events(self, rel_path):
        z = np.load(os.path.join(self.root, rel_path), allow_pickle=True)
        return np.stack((z["t"], z["x"], z["y"], z["p"]), axis=1)

    def _voxel(self, window, is_reverse=False):
        v = events_to_voxel_grid(window, self.num_bins, self.width,
                                 self.height, is_reverse=is_reverse)
        return event_preprocess(v, mode="std", filter_hot_pixel=False)

    def _load_image(self, rel_path):
        img = cv2.imread(os.path.join(self.root, rel_path),
                         cv2.IMREAD_GRAYSCALE)
        return np.float32(img) / 255.0

    def _load_flow(self, rel_path, name):
        return self.flow_coef * np.load(
            os.path.join(self.root, rel_path), allow_pickle=True)[name]

    def get_step(self, line_id, load_flow=True):
        """One reconstruction step as (batch_data, batch_target) of CHW-free
        numpy arrays: voxel (C,H,W), images (H,W), flow (2,H,W).

        load_flow=False skips the flow npz decode entirely, for consumers
        that read the raw flow file themselves (e.g. SimFlowPairs)."""
        window = self._load_events(self.event_paths[line_id])
        batch_data = {"event_voxel": self._voxel(window)}
        if self.is_reverse_events:
            batch_data["event_voxel_bw"] = self._voxel(window, is_reverse=True)
        if self.model_mode == "cista-eraft":
            name = self.event_paths[line_id]
            first = line_id == 0 or \
                int(name.split(".")[-2].split("_")[-1]) == 0
            if first:
                batch_data["event_voxel_old"] = np.zeros_like(
                    batch_data["event_voxel"])
            else:
                old = self._load_events(self.event_paths[line_id - 1])
                batch_data["event_voxel_old"] = self._voxel(old)

        batch_target = {
            "gt_img0": self._load_image(self.image_paths[line_id]),
            "gt_img1": self._load_image(self.next_image_paths[line_id]),
        }
        if load_flow:
            batch_target["gt_flow"] = self._load_flow(
                self.flow_paths[line_id], self.flow_name)
        if load_flow and self.is_bi:
            batch_target["gt_flow_bw"] = self._load_flow(
                self.flow_paths[line_id], self.flow_name_bw)
        return batch_data, batch_target

    def __getitem__(self, index):
        """Reference-style: list of (batch_data, batch_target) per step."""
        ids = self.sequence_line_id[index]
        flat = []
        for item in ids:
            if isinstance(item, list):
                flat.extend(item)
            else:
                flat.append(item)
        return [self.get_step(i) for i in flat]


def _to_nhwc(a: np.ndarray) -> np.ndarray:
    if a.ndim == 2:  # (H, W) image
        return a[..., None]
    return np.transpose(a, (1, 2, 0))  # (C, H, W) -> (H, W, C)


class StackedSequenceLoader:
    """Batches sequences into (T, B, H, W, C) NHWC stacks for lax.scan BPTT.

    Sequences shorter than ``len_sequence`` are dropped; longer ones are cut
    into ``len_sequence`` chunks (static shapes for one compiled step).
    """

    def __init__(self, dataset: TrainSequenceDataset, batch_size: int,
                 len_sequence: int, shuffle: bool = True, seed: int = 0,
                 num_workers: int = 4, process_index: int = 0,
                 process_count: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.t = len_sequence
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers) \
            if num_workers > 0 else None

        # pre-compute fixed-length chunks of line ids
        self.chunks = []
        for ids in self.ds.sequence_line_id:
            flat = []
            for item in ids:
                flat.extend(item) if isinstance(item, list) else flat.append(item)
            for s in range(0, len(flat) - self.t + 1, self.t):
                self.chunks.append(flat[s:s + self.t])
        # multi-host: each process reads a disjoint round-robin subset; the
        # per-host batches are assembled into one global array by
        # parallel.shard_seq_batch (jax.make_array_from_process_local_data)
        if process_count > 1:
            shard = self.chunks[process_index::process_count]
            # All hosts MUST yield the same number of batches per epoch —
            # an uneven round-robin split (len(chunks) % process_count != 0)
            # would leave one host running an extra collective step and
            # deadlock the jitted train step. Truncate every shard to the
            # common minimum batch count.
            n_batches = (len(self.chunks) // process_count) // batch_size
            self.chunks = shard[:n_batches * batch_size]

    def __len__(self):
        return len(self.chunks) // self.batch_size

    def _load_chunk(self, chunk):
        steps = [self.ds.get_step(i) for i in chunk]
        out = {}
        keys_d = steps[0][0].keys()
        keys_t = steps[0][1].keys()
        for k in keys_d:
            out[k] = np.stack([_to_nhwc(s[0][k]) for s in steps])
        for k in keys_t:
            out[k] = np.stack([_to_nhwc(s[1][k]) for s in steps])
        return out  # dict of (T, H, W, C)

    def __iter__(self):
        order = np.arange(len(self.chunks))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        for i in range(0, len(order) - bs + 1, bs):
            chunk_ids = [self.chunks[j] for j in order[i:i + bs]]
            if self.pool is not None:
                loaded = list(self.pool.map(self._load_chunk, chunk_ids))
            else:
                loaded = [self._load_chunk(c) for c in chunk_ids]
            yield {k: np.stack([l[k] for l in loaded], axis=1)
                   for k in loaded[0]}  # (T, B, H, W, C)
