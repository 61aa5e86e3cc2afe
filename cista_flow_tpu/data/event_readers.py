"""Event stream readers (host side).

Equivalents of the reference's three readers (ref:
data_readers/event_readers.py:6-128): fixed-count windows with optional
sliding overlap, frame-timestamp-bounded windows, and per-frame .npz windows.
"""
from __future__ import annotations

from os.path import splitext

import numpy as np
import pandas as pd


class FixedSizeEventReader:
    """Fixed-count event windows from a .txt/.zip/.csv stream, with optional
    ``k_shift`` sliding-window overlap (ref: event_readers.py:6-47)."""

    def __init__(self, path_to_event_file, num_events=10000, k_shift=-1,
                 start_index=0):
        self.iterator = pd.read_csv(
            path_to_event_file, sep=r"\s+", header=None, iterator=True,
            names=["t", "x", "y", "pol"],
            dtype={"t": np.float64, "x": np.int16, "y": np.int16,
                   "pol": np.int16},
            engine="c", index_col=False, skiprows=start_index + 1)
        self.num_events = num_events
        self.k_shift = k_shift
        self.prev_events_size = num_events - k_shift
        self.frame_idx = 0
        self.prev_events = None

    def __iter__(self):
        return self

    def __next__(self):
        if self.k_shift > 0:
            if self.frame_idx == 0:
                window = np.array(self.iterator.get_chunk(self.num_events))
            else:
                chunk = np.array(self.iterator.get_chunk(self.k_shift))
                window = np.concatenate((self.prev_events, chunk), 0)
            self.prev_events = window[-self.prev_events_size:].copy()
            self.frame_idx += 1
        else:
            window = np.array(self.iterator.get_chunk(self.num_events))
        if len(window) == 0:
            raise StopIteration
        return window


class RefTimeEventReaderZip:
    """Windows bounded by reference frame timestamps: loads the whole file,
    precomputes boundary indices, yields events between consecutive frames
    (ref: event_readers.py:50-101)."""

    def __init__(self, path_to_event_file, t_image):
        assert splitext(path_to_event_file)[1] in (".txt", ".csv", ".zip")
        df = pd.read_csv(
            path_to_event_file, delimiter=" ", header=None,
            names=["t", "x", "y", "p"],
            dtype={"t": np.float64, "x": np.int16, "y": np.int16,
                   "p": np.int16},
            engine="c", index_col=False)
        self.values = df.values
        self.t_image = np.array(t_image) - t_image[0]
        self.len = len(t_image) - 1
        self.t0 = t_image[0]
        timestamps = self.values[:, 0] - t_image[0]
        self.bound_index = []
        for t in self.t_image:
            idx = np.searchsorted(timestamps, t, side="left")
            if idx >= len(timestamps):
                idx = len(timestamps) - 1
            self.bound_index.append(int(idx))
        self.frame_id = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self.frame_id >= self.len:
            raise StopIteration
        lo = self.bound_index[self.frame_id]
        hi = self.bound_index[self.frame_id + 1]
        window = self.values[lo:hi].copy()
        window[:, 0] -= self.t0
        self.frame_id += 1
        return window


class SingleEventReaderNpz:
    """Per-frame .npz (t, x, y, p) windows for simulated sequences
    (ref: event_readers.py:104-128)."""

    def __init__(self, paths_to_events):
        self.paths = list(paths_to_events)
        self.frame_id = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self.frame_id >= len(self.paths):
            raise StopIteration
        z = np.load(self.paths[self.frame_id])
        window = np.stack((z["t"], z["x"], z["y"], z["p"]), axis=1)
        self.frame_id += 1
        return window
