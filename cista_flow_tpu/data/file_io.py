"""Flow / image / event file I/O (host side).

Equivalents of the reference's vendored flow readers
(ref: DCEIFlow/utils/file_io.py): Middlebury .flo, PFM, KITTI 16-bit png
flows, h5 event files — plus writers for round-tripping.
"""
from __future__ import annotations

import os
import re

import numpy as np

FLO_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo -> (H, W, 2) float32 (little-endian)."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if len(magic) == 0 or magic[0] != np.float32(FLO_MAGIC):
            raise ValueError(f"{path}: invalid .flo magic")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.float32([FLO_MAGIC]).tofile(f)
        np.int32([w]).tofile(f)
        np.int32([h]).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path: str) -> np.ndarray:
    """PFM -> (H, W[, 3]) float array, bottom-up flipped like the reference."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dim = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not dim:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dim.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape))


def read_flow_kitti(path: str):
    """KITTI 16-bit png -> (flow (H,W,2), valid (H,W))."""
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    flow = (flow - 2**15) / 64.0
    return flow, valid


def write_flow_kitti(path: str, flow: np.ndarray, valid: np.ndarray | None = None):
    import cv2

    h, w = flow.shape[:2]
    enc = (flow * 64.0 + 2**15).astype(np.uint16)
    v = (np.ones((h, w), np.uint16) if valid is None
         else valid.astype(np.uint16))
    out = np.dstack([enc, v[..., None]])[..., ::-1]
    cv2.imwrite(path, out)


def read_dense_flow(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[-1]
    if ext == ".flo":
        return read_flo(path).astype(np.float32)
    if ext == ".pfm":
        flow = read_pfm(path).astype(np.float32)
        return flow if flow.ndim == 2 else flow[:, :, :-1]
    raise ValueError(f"unsupported dense flow format {ext}")


def read_gen(path: str):
    """Generic reader (ref: file_io.py:85-93)."""
    ext = os.path.splitext(path)[-1]
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img.ndim == 3:
            img = img[:, :, ::-1]  # BGR -> RGB
        return img
    if ext in (".bin", ".raw"):
        return np.load(path)
    if ext in (".flo", ".pfm"):
        return read_dense_flow(path)
    return []


def read_event_h5(path: str) -> np.ndarray:
    """h5 event file with x/y/t/p datasets -> (N, 4) [x, y, t, p]
    (ref: file_io.py:107-117)."""
    import h5py

    with h5py.File(path, "r") as f:
        n = len(f["x"])
        events = np.zeros([n, 4], dtype=np.float32)
        events[:, 0] = f["x"]
        events[:, 1] = f["y"]
        events[:, 2] = f["t"]
        events[:, 3] = f["p"]
    return events
