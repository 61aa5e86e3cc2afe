"""Host-side (numpy) event voxelization — golden reference + data-pipeline path.

Byte-compatible with the reference's ingestion kernel
(ref: utils/event_process.py:15-72, 193-216). The device path
(cista_flow_tpu.ops.voxel) is tested against this.
"""
from __future__ import annotations

import numpy as np


import os

_USE_NATIVE = os.environ.get("CISTA_NO_NATIVE", "0") != "1"


def events_to_voxel_grid(
    events: np.ndarray,
    num_bins: int,
    width: int,
    height: int,
    is_reverse: bool = False,
) -> np.ndarray:
    """N x 4 ``[t, x, y, p]`` -> (num_bins, H, W) float32 voxel grid.

    Bilinear split of each event between temporal bins floor(t)/floor(t)+1;
    polarity mapped to +/-1 (zeros become -1). ``is_reverse`` flips event
    order AND polarity (used for the reversed voxel in bilateral training).

    Dispatches to the native C++ kernel when available (bit-identical,
    ~20-50x faster than np.add.at); set CISTA_NO_NATIVE=1 to force numpy.
    """
    if _USE_NATIVE and len(events):
        from . import native

        out = native.voxelize_events(events, num_bins, width, height,
                                     is_reverse)
        if out is not None:
            return out
    return events_to_voxel_grid_numpy(events, num_bins, width, height,
                                      is_reverse)


def events_to_voxel_grid_numpy(
    events: np.ndarray,
    num_bins: int,
    width: int,
    height: int,
    is_reverse: bool = False,
) -> np.ndarray:
    """Pure-numpy golden implementation (the native kernel is tested
    bit-exact against this)."""
    assert events.ndim == 2 and events.shape[1] == 4
    voxel = np.zeros((num_bins, height, width), np.float32).ravel()

    if is_reverse:
        events = np.flip(events, axis=0)
    if len(events) == 0:
        return voxel.reshape(num_bins, height, width)

    first, last = events[0, 0], events[-1, 0]
    dt = last - first
    if dt == 0:
        dt = 1.0

    ts = (num_bins - 1) * (events[:, 0] - first) / dt
    xs = events[:, 1].astype(np.int64)
    ys = events[:, 2].astype(np.int64)
    pols = events[:, 3].copy()
    pols[pols == 0] = -1
    if is_reverse:
        # Reference quirk preserved (utils/event_process.py:52-54): after the
        # 0 -> -1 mapping above, `pols[pols==1] = -1; pols[pols==0] = 1` sets
        # EVERY polarity to -1 (the second assignment finds no zeros). The
        # intended polarity flip never happens; we reproduce the behavior.
        pols[:] = -1

    tis = ts.astype(np.int64)
    dts = ts - tis
    vals_left = pols * (1.0 - dts)
    vals_right = pols * dts

    ok = tis < num_bins
    np.add.at(
        voxel, xs[ok] + ys[ok] * width + tis[ok] * width * height, vals_left[ok]
    )
    ok = (tis + 1) < num_bins
    np.add.at(
        voxel,
        xs[ok] + ys[ok] * width + (tis[ok] + 1) * width * height,
        vals_right[ok],
    )
    return voxel.reshape(num_bins, height, width)


def events_to_voxel_grid_pol(
    events: np.ndarray, num_bins: int, width: int, height: int
) -> np.ndarray:
    """Polarity-separated variant -> (num_bins, 2, H, W)
    (ref: utils/event_process.py:75-123)."""
    voxel = np.zeros((num_bins, 2, height, width), np.float32).ravel()
    if len(events) == 0:
        return voxel.reshape(num_bins, 2, height, width)

    first, last = events[0, 0], events[-1, 0]
    dt = last - first
    if dt == 0:
        dt = 1.0
    ts = (num_bins - 1) * (events[:, 0] - first) / dt
    xs = events[:, 1].astype(np.int64)
    ys = events[:, 2].astype(np.int64)
    pols = events[:, 3].copy()
    ps = pols.astype(np.int64)  # 0 / 1 channel index
    pols[pols == 0] = 1.0  # magnitude always 1

    tis = ts.astype(np.int64)
    dts = ts - tis
    vals_left = pols * (1.0 - dts)
    vals_right = pols * dts
    plane = width * height

    ok = tis < num_bins
    np.add.at(
        voxel,
        xs[ok] + ys[ok] * width + ps[ok] * plane + tis[ok] * plane * 2,
        vals_left[ok],
    )
    ok = (tis + 1) < num_bins
    np.add.at(
        voxel,
        xs[ok] + ys[ok] * width + ps[ok] * plane + (tis[ok] + 1) * plane * 2,
        vals_right[ok],
    )
    return voxel.reshape(num_bins, 2, height, width)


def event_preprocess(
    voxel: np.ndarray, mode: str = "std", filter_hot_pixel: bool = False
) -> np.ndarray:
    """Nonzero-masked normalization (ref: utils/event_process.py:193-216).

    Dispatches to the native kernel for mode='std' when available."""
    if _USE_NATIVE and mode == "std":
        from . import native

        v = np.ascontiguousarray(voxel, dtype=np.float32)
        if native.preprocess_std(v, filter_hot_pixel):
            return v
    return event_preprocess_numpy(voxel, mode, filter_hot_pixel)


def event_preprocess_numpy(
    voxel: np.ndarray, mode: str = "std", filter_hot_pixel: bool = False
) -> np.ndarray:
    """Pure-numpy golden implementation."""
    num_bins = voxel.shape[0]
    if filter_hot_pixel:
        voxel[np.abs(voxel) > 25.0 / num_bins] = 0
    if mode == "maxmin":
        return (voxel - voxel.min()) / (voxel.max() - voxel.min() + 1e-8)
    assert mode == "std"
    nonzero = voxel != 0
    num = nonzero.sum()
    if num > 0:
        mean = voxel.sum() / num
        stddev = np.sqrt((voxel**2).sum() / num - mean**2)
        voxel = nonzero.astype(np.float32) * (voxel - mean) / (stddev + 1e-8)
    return voxel


def add_noise_to_voxel(voxel, noise_std=1.0, noise_fraction=0.1, rng=None):
    """Noise-injection augmentation (ref: utils/event_process.py:8-13)."""
    rng = rng or np.random.default_rng()
    noise = noise_std * rng.standard_normal(voxel.shape).astype(np.float32)
    if noise_fraction < 1.0:
        noise[rng.random(voxel.shape) >= noise_fraction] = 0
    return voxel + noise
