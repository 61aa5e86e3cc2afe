"""Output writers + visualization helpers (host side).

Equivalents of the reference's writer family and flow/event visualizations
(ref: utils/data_io.py): per-frame PNG writers, per-sequence CSV eval writer,
flow -> HSV RGB, event previews, error maps, video assembly.
"""
from __future__ import annotations

import csv
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def merge_optical_flow(flow: np.ndarray) -> np.ndarray:
    """Flow (2, H, W) -> HSV-coded BGR uint8 (ref: data_io.py:9-29)."""
    fx, fy = flow[0], flow[1]
    h, w = fx.shape[:2]
    hsv = np.zeros((h, w, 3), dtype=np.uint8)
    hsv[..., 1] = 255
    magnitude, angle = cv2.cartToPolar(fx.astype(np.float32), fy.astype(np.float32))
    hsv[..., 0] = (angle * 180 / np.pi / 2).astype(np.uint8)
    maxmag = magnitude.max()
    if maxmag > 0:
        hsv[..., 2] = (255 * magnitude / maxmag).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def make_event_preview(events: np.ndarray, mode: str = "grayscale",
                       num_bins_to_show: int = -1) -> np.ndarray:
    """Voxel (C,H,W) or (1,C,H,W) -> displayable uint8 (ref: data_io.py:32-61)."""
    if events.ndim == 3:
        events = events[None]
    if num_bins_to_show < 0:
        s = np.sum(events[0], axis=0)
    else:
        s = np.sum(events[0, -num_bins_to_show:], axis=0)
    if mode == "red-blue":
        preview = np.zeros((*s.shape, 3), dtype=np.uint8)
        preview[..., 0][s > 0] = 255  # blue (BGR)
        preview[..., 2][s < 0] = 255  # red
        return preview
    m, M = -5.0, 5.0
    return np.clip(255.0 * (s - m) / (M - m), 0, 255).astype(np.uint8)


class Writer:
    def __init__(self, cfgs, model_name, dataset_name=None):
        self.output_folder = cfgs.output_folder
        self.dataset_name = dataset_name or cfgs.test_data_name
        os.makedirs(self.output_folder, exist_ok=True)
        self.output_data_folder = os.path.join(
            self.output_folder, model_name, str(self.dataset_name))


class ImageWriter(Writer):
    """Per-frame reconstruction PNGs (ref: data_io.py:139-161)."""

    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.enabled = cfgs.is_write_image
        if self.enabled:
            os.makedirs(self.output_data_folder, exist_ok=True)

    def __call__(self, img: np.ndarray, img_id: int):
        if not self.enabled:
            return
        cv2.imwrite(os.path.join(self.output_data_folder,
                                 f"frame_{img_id:010d}.png"),
                    np.uint8(img))


class EvalWriter(Writer):
    """Tab-separated eval CSVs (ref: data_io.py:77-102)."""

    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.enabled = cfgs.is_write_image
        if self.enabled:
            os.makedirs(self.output_data_folder, exist_ok=True)
            self.output_txt_file = os.path.join(self.output_data_folder,
                                                "result.csv")

    def __call__(self, name_results, results):
        if not self.enabled:
            return
        with open(self.output_txt_file, "a+", newline="") as f:
            w = csv.writer(f, delimiter="\t")
            w.writerow(name_results)
            w.writerow(results)


class FlowWriter(Writer):
    """Flow visualizations (ref: data_io.py:164-192)."""

    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.enabled = cfgs.is_write_flow
        if self.enabled:
            self.output_data_folder = os.path.join(self.output_data_folder, "flow")
            os.makedirs(self.output_data_folder, exist_ok=True)

    def __call__(self, flow: np.ndarray, img_id: int):
        if not self.enabled:
            return
        cv2.imwrite(os.path.join(self.output_data_folder,
                                 f"flow_{img_id:010d}.png"),
                    merge_optical_flow(flow))


class EventWriter(Writer):
    """Event preview PNGs (ref: data_io.py:195-219)."""

    def __init__(self, cfgs, model_name, dataset_name=None,
                 save_folder_name="events"):
        super().__init__(cfgs, model_name, dataset_name)
        self.enabled = cfgs.is_write_event
        if self.enabled:
            self.output_data_folder = os.path.join(self.output_data_folder,
                                                   save_folder_name)
            os.makedirs(self.output_data_folder, exist_ok=True)

    def __call__(self, img: np.ndarray, img_id: int):
        if not self.enabled:
            return
        cv2.imwrite(os.path.join(self.output_data_folder,
                                 f"events_{img_id:010d}.png"),
                    np.uint8(img))


class ErrorMapWriter(Writer):
    """Signed error maps, RdBu colormapped (ref: data_io.py:105-136).
    Uses cv2 colormap (no matplotlib dependency on the hot path)."""

    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.enabled = cfgs.is_write_emap
        if self.enabled:
            self.output_data_folder = os.path.join(self.output_data_folder,
                                                   "error_maps")
            os.makedirs(self.output_data_folder, exist_ok=True)

    def __call__(self, img, gt_img, img_id: int):
        if not self.enabled:
            return
        diff = img.astype(np.float32) / 255.0 - gt_img.astype(np.float32) / 255.0
        # map [-0.5, 0.5] -> [0, 255]
        scaled = np.clip((diff + 0.5) * 255, 0, 255).astype(np.uint8)
        colored = cv2.applyColorMap(255 - scaled, cv2.COLORMAP_COOL)
        cv2.imwrite(os.path.join(self.output_data_folder,
                                 f"frame_{img_id:010d}.png"), colored)


class VideoWriter(Writer):
    """Collect frames, assemble an mp4 on ``write_video`` (ref: data_io.py:223-264)."""

    def __init__(self, cfgs, model_name, video_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.enabled = cfgs.is_write_video
        self.video_name = video_name
        self.img_list = []
        if self.enabled:
            self.output_data_folder = os.path.join(self.output_data_folder, "video")
            os.makedirs(self.output_data_folder, exist_ok=True)

    def __call__(self, img: np.ndarray):
        if not self.enabled:
            return
        if img.dtype in (np.float32, np.float64):
            img = np.uint8(255.0 * img)
        self.img_list.append(img)

    def write_video(self, fps: int = 12):
        if not self.enabled or not self.img_list:
            return
        h, w = self.img_list[0].shape[:2]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        video = cv2.VideoWriter(
            os.path.join(self.output_data_folder, self.video_name + ".mp4"),
            fourcc, fps, (w, h))
        for img in self.img_list:
            if img.ndim == 2:
                img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
            video.write(img)
        video.release()


def show_whole_img(event_patch, output, gt_img_patch, path="test_images/train_rec.png"):
    """Side-by-side debug panel (ref: utils/data_io.py:268-289).
    Inputs: NHWC numpy/jax arrays."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ev = np.asarray(event_patch)
    pred = np.asarray(output)
    gt = np.asarray(gt_img_patch)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].imshow(ev[0, :, :, 0])
    axes[0].set_title(f"mean {ev.mean():.3f}, var {ev.var():.3f}")
    axes[1].imshow(pred[0, :, :, 0], cmap="gray")
    axes[1].set_title(f"mean {pred.mean():.3f}, var {pred.var():.3f}")
    axes[2].imshow(gt[0, :, :, 0])
    axes[2].set_title(f"mean {gt.mean():.3f}, var {gt.var():.3f}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def show_flow(pred_flow, gt_flow, warped_pred_diff, warped_gt_diff,
              path="test_images/flow.png"):
    """Flow debug panel (ref: utils/data_io.py:291-325). NHWC inputs."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    axes[0, 0].imshow(np.asarray(gt_flow)[0, :, :, 0])
    axes[0, 0].set_title("GT flow")
    axes[0, 1].imshow(np.asarray(pred_flow)[0, :, :, 0])
    axes[0, 1].set_title("Pred flow")
    axes[1, 0].imshow(np.asarray(warped_gt_diff)[0, :, :, 0], cmap="gray")
    axes[1, 0].set_title("Diff w gt flow")
    axes[1, 1].imshow(np.asarray(warped_pred_diff)[0, :, :, 0], cmap="gray")
    axes[1, 1].set_title("Diff w pred flow")
    for ax in axes.ravel():
        ax.axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
