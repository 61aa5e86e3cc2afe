"""Streaming video/event pack readers for evaluation (host side).

Equivalents of the reference's VR / ImageReader / VideoReader
(ref: data_readers/video_readers.py:42-457): pair GT frames, events, and
(optionally) GT flow into per-reconstruction packs, with the three windowing
policies the eval CLIs use.
"""
from __future__ import annotations

import os

import numpy as np

from ..events import event_preprocess, events_to_voxel_grid
from .event_readers import RefTimeEventReaderZip, SingleEventReaderNpz

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def read_timestamps_file(path, unit="s"):
    """Two txt formats (name- vs value-first) + unit conversion
    (ref: video_readers.py:10-38)."""
    timestamps = []
    col = 1 if os.path.basename(path) == "timestamps.txt" else 0
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if parts:
                timestamps.append(float(parts[col]))
    t = np.array(timestamps)
    if unit == "us":
        t = t / 1e6
    elif unit == "ns":
        t = t / 1e9
    return list(t)


class VR:
    """Base streaming reader: frames + events -> per-reconstruction packs."""

    def __init__(self, image_dim, num_bins=5):
        self.height, self.width = image_dim
        self.frame_id = 0
        self.num_frames = -1
        self.timestamps = []
        self.num_bins = num_bins
        self.ending = False
        self.prev_frame = None
        self.num_events = 0

    # subclasses provide:
    def update_frame(self):
        raise NotImplementedError

    def update_flow(self, i0=None, i1=None):
        raise NotImplementedError

    def update_events(self):
        raise NotImplementedError

    # -- windowing policies ---------------------------------------------------

    def _accumulate(self, limit_num_events, threshold_factor, frame_pack):
        """Accumulate events across frames until >= threshold_factor*limit."""
        total, pack, window, gt_frame = 0, [], np.empty((0, 4)), None
        while total < threshold_factor * limit_num_events and \
                self.frame_id < self.num_frames:
            gt_frame, _ = self.update_frame()
            events = self.update_events()
            if frame_pack is not None:
                frame_pack.append(gt_frame)
            if events is not None:
                pack.append(events)
                total += len(events)
            if pack:
                window = np.concatenate(pack, 0) if len(pack) > 1 else pack[0]
        return window, gt_frame

    def _voxelize(self, window, limit_num_events, split):
        """One voxel ('upsampled') or ~N-event chunks ('real': several voxels
        per GT frame, ref: video_readers.py:128-141)."""
        self.num_events = len(window)
        if not split:
            v = events_to_voxel_grid(window, self.num_bins, self.width,
                                     self.height)
            return [event_preprocess(v, filter_hot_pixel=False)]
        n = max(round(window.shape[0] / limit_num_events), 1)
        out = []
        for chunk in np.array_split(window, n, axis=0):
            v = events_to_voxel_grid(chunk, self.num_bins, self.width,
                                     self.height)
            out.append(event_preprocess(v, filter_hot_pixel=True))
        return out

    def update_event_frame_pack(self, limit_num_events=-1, mode="upsampled"):
        """(ref: video_readers.py:70-142)."""
        frame_pack = []
        if self.frame_id == 0:
            self.prev_frame, _ = self.update_frame()
        frame_pack.append(self.prev_frame)

        if limit_num_events > 0 and mode == "upsampled":
            window, gt_frame = self._accumulate(limit_num_events, 0.8, frame_pack)
            frame_pack.pop(-1)
            self.prev_frame = gt_frame
        else:
            gt_frame, _ = self.update_frame()
            window = self.update_events()
            self.prev_frame = gt_frame
            if window is None:
                window = np.empty((0, 4))
        if self.frame_id >= self.num_frames:
            self.ending = True
        split = not (limit_num_events <= 0 or mode == "upsampled")
        return self._voxelize(window, limit_num_events, split), frame_pack, gt_frame

    def update_event_frame_pack_fix(self, limit_num_events=-1, mode="upsampled"):
        """Accumulate >= N events across frames ('real' keeps accumulating to
        the full limit) (ref: video_readers.py:145-234)."""
        frame_pack = []
        if self.frame_id == 0:
            self.prev_frame, _ = self.update_frame()
        frame_pack.append(self.prev_frame)

        if limit_num_events > 0 and mode == "upsampled":
            window, gt_frame = self._accumulate(limit_num_events, 0.8, frame_pack)
            frame_pack.pop(-1)
            # divergence from the reference: it never sets `ending` on this
            # branch and hits an unbound variable at stream end
            # (ref: video_readers.py:167-183); terminate cleanly instead.
            if gt_frame is None:
                self.ending = True
                gt_frame = self.prev_frame
            if self.frame_id >= self.num_frames:
                self.ending = True
            self.prev_frame = gt_frame
        elif limit_num_events > 0 and mode == "real":
            window, gt_frame = self._accumulate(limit_num_events, 1.0, None)
            if self.frame_id >= self.num_frames:
                self.ending = True
            self.prev_frame = gt_frame
        else:
            gt_frame, _ = self.update_frame()
            window = self.update_events()
            if self.frame_id >= self.num_frames:
                self.ending = True
            self.prev_frame = gt_frame

        window = window[window[:, 1] < self.width]
        window = window[window[:, 2] < self.height]
        split = not (limit_num_events <= 0 or mode == "upsampled")
        return self._voxelize(window, limit_num_events, split), frame_pack, gt_frame

    def update_event_frame_flow_pack(self, mode="upsampled"):
        """With GT flow ('upsampled' only) (ref: video_readers.py:237-282)."""
        assert mode == "upsampled", "Data mode can not be 'real'!"
        frame_pack = []
        if self.frame_id == 0:
            self.prev_frame, _ = self.update_frame()
        frame_pack.append(self.prev_frame)

        gt_frame, _ = self.update_frame()
        flow = self.update_flow(self.prev_frame, gt_frame)
        self.prev_frame = gt_frame
        window = self.update_events()
        if window is None:
            window = np.empty((0, 4))
        if self.frame_id >= self.num_frames:
            self.ending = True
        voxels = self._voxelize(window, -1, False)
        return voxels, frame_pack, gt_frame, [flow]


class VideoReader(VR):
    """cv2 video -> grayscale downscaled frames (HFR video input)
    (ref: video_readers.py:287-339)."""

    def __init__(self, image_dim, ds=(0.25, 0.25)):
        super().__init__(image_dim)
        self.ds = ds

    def initialize(self, path_to_video, num_load_frames=-1):
        assert cv2 is not None, "cv2 required for VideoReader"
        cap = cv2.VideoCapture(path_to_video)
        assert cap.isOpened(), f"cannot open {path_to_video}"
        self.frames, self.timestamps = [], []
        total = cap.get(cv2.CAP_PROP_FRAME_COUNT)
        num_load_frames = total if num_load_frames < 0 else num_load_frames
        fps = cap.get(cv2.CAP_PROP_FPS)
        count = 0
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok or count > num_load_frames:
                break
            self.timestamps.append(count / fps)
            count += 1
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            gray = cv2.resize(gray, dsize=(int(gray.shape[1] * self.ds[1]),
                                           int(gray.shape[0] * self.ds[0])))
            if frame.shape[0] > frame.shape[1]:
                gray = gray.T
            self.frames.append(gray)
        cap.release()
        self.num_frames = len(self.frames)
        self.frame_id = 0

    def update_frame(self, frame_id=None):
        if frame_id is not None:
            self.frame_id = frame_id
        frame = self.frames[self.frame_id]
        ts = self.timestamps[self.frame_id]
        self.frame_id += 1
        return frame, ts


class ImageReader(VR):
    """Sequence-folder reader: frames (jpg/png), timestamps, events (npz list
    or single txt/zip/csv), optional GT flow npz (ref: video_readers.py:343-457)."""

    def __init__(self, cfgs):
        super().__init__(cfgs.image_dim, cfgs.num_bins)
        self.time_unit = cfgs.time_unit
        self.is_forward_flow = cfgs.is_forward_flow
        # GT flow direction/sign handling (ref: video_readers.py:350-351)
        self.flow_name = "flow01" if cfgs.is_forward_flow else "flow10"
        self.flow_coef = 1 if cfgs.is_forward_flow else -1
        self.dataset = cfgs.dataset

    def initialize(self, path_to_sequence, num_load_frames=-1):
        self.frame_id = 0
        self.event_id = 0
        self.flow_id = 0
        self.ending = False
        self.prev_frame = None

        self.path_to_frames, path_to_events, self.path_to_flow = [], [], []
        path_to_timestamps = None
        for root, _, files in os.walk(path_to_sequence):
            for name in files:
                ext = name.split(".")[-1]
                if ext in ("jpg", "png"):
                    self.path_to_frames.append(os.path.join(root, name))
                elif name in ("timestamps.txt", "images.txt", "timestamp.txt"):
                    path_to_timestamps = os.path.join(root, name)
                elif (ext == "npz" and "flow" not in name) or name in (
                        "events.txt", "events.zip", "events.csv"):
                    path_to_events.append(os.path.join(root, name))
                elif ext == "npz" and "flow" in name:
                    self.path_to_flow.append(os.path.join(root, name))

        self.path_to_frames.sort()
        self.path_to_flow.sort()
        self.timestamps = read_timestamps_file(path_to_timestamps, self.time_unit)

        if num_load_frames > 0:
            self.path_to_frames = self.path_to_frames[:num_load_frames]
            self.timestamps = self.timestamps[:num_load_frames]
            if self.path_to_flow:
                self.path_to_flow = self.path_to_flow[:num_load_frames]

        if self.dataset == "HSERGB":
            # HSERGB first-frame duplication (ref: video_readers.py:397-399)
            self.path_to_frames = [self.path_to_frames[0]] + self.path_to_frames
            self.timestamps = [self.timestamps[0]] + self.timestamps

        demo = cv2.imread(self.path_to_frames[0], cv2.IMREAD_GRAYSCALE)
        height = (demo.shape[0] // 2) * 2
        width = (demo.shape[1] // 2) * 2
        assert height == self.height or width == self.width, \
            f"Image dim should be H{height}xW{width}"

        self.num_frames = len(self.path_to_frames)

        if len(path_to_events) > 1:
            path_to_events.sort()
            if num_load_frames > 0:
                path_to_events = path_to_events[:num_load_frames]
            self.event_window_iterator = SingleEventReaderNpz(path_to_events)
        elif len(path_to_events) == 1:
            self.event_window_iterator = RefTimeEventReaderZip(
                path_to_events[0], self.timestamps)

    def update_frame(self, frame_id=None):
        if frame_id is not None:
            self.frame_id = frame_id
        frame = cv2.imread(self.path_to_frames[self.frame_id],
                           cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        frame = frame[:self.height, :self.width]
        ts = self.timestamps[self.frame_id]
        self.frame_id += 1
        return frame, ts

    def update_flow(self, i0=None, i1=None, flow_id=None):
        if flow_id is not None:
            self.flow_id = flow_id
        flow = np.load(self.path_to_flow[self.flow_id],
                       allow_pickle=True)[self.flow_name]
        flow = self.flow_coef * flow[:, :self.height, :self.width] \
            if flow.shape[0] == 2 else self.flow_coef * flow[:self.height, :self.width]
        self.flow_id += 1
        return flow

    def update_events(self):
        try:
            window = next(self.event_window_iterator)
        except StopIteration:
            window = None
        self.event_id += 1
        return window
