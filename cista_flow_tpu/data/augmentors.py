"""Training-time augmentation for flow-net pretraining (host side, numpy).

Equivalents of the reference's vendored augmentors
(ref: DCEIFlow/utils/augmentor/event_augmentor.py:62-273,
image_augmentor.py:14-284): photometric jitter on the image pair
(numpy ColorJitter — no torchvision dependency), horizontal/vertical flips
with flow sign fixes, and random crops. Voxels are augmented jointly with
images and flows.
"""
from __future__ import annotations

import numpy as np


def resize_flow(flow, des_height, des_width):
    """Bilinear flow resize with magnitude scaling
    (ref: event_augmentor.py:13-35). flow: (H, W, 2)."""
    import cv2

    h, w = flow.shape[:2]
    out = cv2.resize(flow, (des_width, des_height),
                     interpolation=cv2.INTER_LINEAR)
    out[..., 0] *= des_width / w
    out[..., 1] *= des_height / h
    return out


def horizontal_flip_flow(flow):
    """(ref: event_augmentor.py:38-43)."""
    return (flow[:, ::-1] * np.array([-1.0, 1.0], flow.dtype)).copy()


def vertical_flip_flow(flow):
    """(ref: event_augmentor.py:46-51)."""
    return (flow[::-1, :] * np.array([1.0, -1.0], flow.dtype)).copy()


def remove_ambiguity_flow(flow_img, err_img, threshold_err=10.0):
    """Zero out flow where the error map exceeds a threshold
    (ref: event_augmentor.py:54-59)."""
    out = flow_img.copy()
    out[err_img > threshold_err] = 0
    return out


class ColorJitter:
    """Numpy photometric jitter (brightness/contrast/saturation/hue) with
    torchvision-style uniform factor ranges."""

    def __init__(self, brightness=0.3, contrast=0.3, saturation=0.3,
                 hue=0.3 / 3.14, rng=None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng or np.random.default_rng()

    def __call__(self, img_u8: np.ndarray) -> np.ndarray:
        import cv2

        img = img_u8.astype(np.float32) / 255.0
        r = self.rng
        b = r.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
        c = r.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
        s = r.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
        h = r.uniform(-self.hue, self.hue)

        img = img * b
        mean = img.mean()
        img = (img - mean) * c + mean
        if img.ndim == 3 and img.shape[-1] == 3:
            gray = img.mean(-1, keepdims=True)
            img = (img - gray) * s + gray
            hsv = cv2.cvtColor(np.clip(img, 0, 1), cv2.COLOR_RGB2HSV)
            hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        return np.clip(img * 255.0, 0, 255).astype(np.uint8)


class EventFlowAugmentor:
    """Joint (voxel, img1, img2, flow01[, flow10, occ, occ10, voxel_r])
    augmentation (ref: event_augmentor.py:62-169)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5,
                 do_flip=False, spatial_aug_prob=0.8, seed=None):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = spatial_aug_prob
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.asymmetric_color_aug_prob = 0.2
        self.rng = np.random.default_rng(seed)
        self.photo_aug = ColorJitter(rng=self.rng)

    def color_transform(self, img1, img2):
        if self.rng.random() < self.asymmetric_color_aug_prob:
            return self.photo_aug(img1), self.photo_aug(img2)
        stack = np.concatenate([img1, img2], axis=0)
        stack = self.photo_aug(stack)
        return np.split(stack, 2, axis=0)

    def spatial_transform(self, event, img1, img2, flow, flow10=None,
                          occ=None, occ10=None, event_r=None):
        if self.do_flip:
            if self.rng.random() < self.h_flip_prob:
                event = event[:, :, ::-1]
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = horizontal_flip_flow(flow)
                flow10 = horizontal_flip_flow(flow10) if flow10 is not None else None
                occ = occ[:, ::-1] if occ is not None else None
                occ10 = occ10[:, ::-1] if occ10 is not None else None
                event_r = event_r[:, :, ::-1] if event_r is not None else None
            if self.rng.random() < self.v_flip_prob:
                event = event[:, ::-1, :]
                img1, img2 = img1[::-1], img2[::-1]
                flow = vertical_flip_flow(flow)
                flow10 = vertical_flip_flow(flow10) if flow10 is not None else None
                occ = occ[::-1] if occ is not None else None
                occ10 = occ10[::-1] if occ10 is not None else None
                event_r = event_r[:, ::-1, :] if event_r is not None else None

        ch, cw = self.crop_size
        y0 = self.rng.integers(0, img1.shape[0] - ch)
        x0 = self.rng.integers(0, img1.shape[1] - cw)

        def crop_img(a):
            return None if a is None else a[y0:y0 + ch, x0:x0 + cw]

        def crop_vox(a):
            return None if a is None else a[:, y0:y0 + ch, x0:x0 + cw]

        return (crop_vox(event), crop_img(img1), crop_img(img2),
                crop_img(flow), crop_img(flow10), crop_img(occ),
                crop_img(occ10), crop_vox(event_r))

    def __call__(self, event, img1, img2, flow, flow10=None, occ=None,
                 occ10=None, event_r=None):
        img1, img2 = self.color_transform(img1, img2)
        outs = self.spatial_transform(event, img1, img2, flow, flow10, occ,
                                      occ10, event_r)
        return tuple(None if o is None else np.ascontiguousarray(o)
                     for o in outs)


class SparseEventFlowAugmentor(EventFlowAugmentor):
    """Sparse-GT variant: carries validity masks through the same transforms
    (ref: event_augmentor.py:173-273)."""

    def __call__(self, event, img1, img2, flow, valid=None, flow10=None,
                 valid10=None):
        img1, img2 = self.color_transform(img1, img2)
        event, img1, img2, flow, flow10, valid, valid10, _ = \
            self.spatial_transform(event, img1, img2, flow, flow10, valid,
                                   valid10, None)
        out = (event, img1, img2, flow, valid, flow10, valid10)
        return tuple(None if o is None else np.ascontiguousarray(o)
                     for o in out)


def fetch_augmentor(is_event=True, is_sparse=False, aug_params=None):
    """(ref: DCEIFlow/utils/augmentor/__init__ equivalent dispatch)."""
    aug_params = aug_params or {}
    if is_sparse:
        return SparseEventFlowAugmentor(**aug_params)
    return EventFlowAugmentor(**aug_params)
