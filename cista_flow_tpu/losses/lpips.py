"""LPIPS perceptual distance in JAX (AlexNet backbone, the reference's choice).

The reference wraps ``lpips.LPIPS(net='alex')`` with 1->3 channel tiling and
``normalize=True`` ([0,1] -> [-1,1]) (ref: utils/evaluate.py:45-68;
loss.py:310). This is a faithful re-implementation:

* scaling layer: (x - shift) / scale with the published constants
* AlexNet features: 5 conv stages, taps after each ReLU
* per-tap unit-normalization over channels, squared diff, learned 1x1 linear
  heads, spatial mean, summed over taps.

Pretrained weights (torchvision AlexNet features + lpips linear heads) load
from the official checkpoint files via ``load_torch_weights`` — this image
has no network access, so without a weights file the module runs with random
weights (fine for smoke tests and for architectures that do not need the
perceptual term; quality evals should provide weights).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv as C

# (out, in, kernel, stride, pad) of torchvision AlexNet features convs
_ALEX = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
# VGG16 conv plan: (out, in); taps after relu{1_2, 2_2, 3_3, 4_3, 5_3};
# maxpool (2x2 s2) after each tap except the last.
_VGG = [
    [(64, 3), (64, 64)],
    [(128, 64), (128, 128)],
    [(256, 128), (256, 256), (256, 256)],
    [(512, 256), (512, 512), (512, 512)],
    [(512, 512), (512, 512), (512, 512)],
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init(key, net: str = "alex") -> dict:
    params = {"convs": [], "lins": []}
    if net == "alex":
        ks = jax.random.split(key, 10)
        for i, (cout, cin, k, _, _) in enumerate(_ALEX):
            params["convs"].append(C.conv_params(ks[i], k, k, cin, cout))
            params["lins"].append(
                {"w": jnp.abs(0.01 * jax.random.normal(ks[5 + i], (1, 1, cout, 1)))})
    elif net == "vgg":
        n = sum(len(s) for s in _VGG)
        ks = jax.random.split(key, n + 5)
        i = 0
        for stage in _VGG:
            for cout, cin in stage:
                params["convs"].append(C.conv_params(ks[i], 3, 3, cin, cout))
                i += 1
        for j, stage in enumerate(_VGG):
            cout = stage[-1][0]
            params["lins"].append(
                {"w": jnp.abs(0.01 * jax.random.normal(ks[n + j], (1, 1, cout, 1)))})
    else:
        raise ValueError(net)
    return params


def _maxpool(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _features(params, x):
    taps = []
    if len(params["convs"]) == 5:  # alex
        for i, (cout, cin, k, stride, pad) in enumerate(_ALEX):
            x = C.apply_conv(params["convs"][i], x, stride=stride, padding=pad)
            x = jax.nn.relu(x)
            taps.append(x)
            if i in (0, 1):
                x = _maxpool(x, 3, 2)
    else:  # vgg16
        i = 0
        for si, stage in enumerate(_VGG):
            for _ in stage:
                x = jax.nn.relu(C.apply_conv(params["convs"][i], x, padding=1))
                i += 1
            taps.append(x)
            if si < len(_VGG) - 1:
                x = _maxpool(x, 2, 2)
    return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips(params: dict, pred: jnp.ndarray, target: jnp.ndarray,
          normalize: bool = True) -> jnp.ndarray:
    """Mean LPIPS distance. pred/target: (B, H, W, 1 or 3) in [0,1] if
    ``normalize`` else [-1,1]."""
    if pred.shape[-1] == 1:
        pred = jnp.tile(pred, (1, 1, 1, 3))
        target = jnp.tile(target, (1, 1, 1, 3))
    if normalize:
        pred = 2.0 * pred - 1.0
        target = 2.0 * target - 1.0
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    pred = (pred - shift) / scale
    target = (target - shift) / scale

    f1 = _features(params, pred)
    f2 = _features(params, target)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        v = C.apply_conv(params["lins"][i], d)  # 1x1 linear head, no bias
        total = total + jnp.mean(v, axis=(1, 2, 3))
    return jnp.mean(total)


def load_torch_weights(alexnet_path: str | None = None,
                       lpips_path: str | None = None,
                       lpips_full_path: str | None = None) -> dict:
    """Build params from torch checkpoints.

    Either pass ``lpips_full_path`` (a full lpips.LPIPS state_dict containing
    net.slice* convs + lin* heads) or the torchvision ``alexnet_path`` +
    lpips linear-head ``lpips_path``.
    """
    import torch

    params = {"convs": [], "lins": []}

    def conv_from(w, b=None):
        p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
        if b is not None:
            p["b"] = jnp.asarray(b)
        return p

    if lpips_full_path is not None:
        sd = torch.load(lpips_full_path, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items()}
        # net.slice{1..5}.<idx>.weight — collect conv layers in order
        conv_keys = sorted(
            [k for k in sd if k.startswith("net.") and k.endswith(".weight")
             and sd[k].ndim == 4],
            key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])))
        for k in conv_keys:
            params["convs"].append(conv_from(sd[k], sd[k[:-6] + "bias"]))
        for i in range(5):
            w = sd[f"lin{i}.model.1.weight"]  # (1, C, 1, 1)
            params["lins"].append({"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))})
        return params

    if alexnet_path is not None:
        sd = torch.load(alexnet_path, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items()}
        conv_idxs = sorted(
            int(k.split(".")[1]) for k in sd
            if k.startswith("features.") and k.endswith(".weight")
            and sd[k].ndim == 4)
        for i in conv_idxs:
            params["convs"].append(
                conv_from(sd[f"features.{i}.weight"], sd[f"features.{i}.bias"]))
    if lpips_path is not None:
        sd = torch.load(lpips_path, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items()}
        for i in range(5):
            w = sd[f"lin{i}.model.1.weight"]
            params["lins"].append({"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))})
    return params


def save_npz(params: dict, path: str) -> None:
    """Serialize converted LPIPS params to a flat .npz (no torch needed to
    load). Layout: conv{i}_w / conv{i}_b (HWIO) + lin{i}_w."""
    flat = {}
    for i, p in enumerate(params["convs"]):
        flat[f"conv{i}_w"] = np.asarray(p["w"])
        if "b" in p:
            flat[f"conv{i}_b"] = np.asarray(p["b"])
    for i, p in enumerate(params["lins"]):
        flat[f"lin{i}_w"] = np.asarray(p["w"])
    np.savez(path, **flat)


def load_npz(path: str) -> dict:
    """Load params saved by :func:`save_npz`."""
    flat = np.load(path)
    params = {"convs": [], "lins": []}
    n_convs = sum(1 for k in flat.files if k.startswith("conv") and k.endswith("_w"))
    for i in range(n_convs):
        p = {"w": jnp.asarray(flat[f"conv{i}_w"])}
        if f"conv{i}_b" in flat.files:
            p["b"] = jnp.asarray(flat[f"conv{i}_b"])
        params["convs"].append(p)
    n_lins = sum(1 for k in flat.files if k.startswith("lin"))
    for i in range(n_lins):
        params["lins"].append({"w": jnp.asarray(flat[f"lin{i}_w"])})
    return params


def load_weights(path: str) -> dict:
    """Load LPIPS weights from either a converted .npz (preferred; see
    ``convert_lpips.py``) or a full torch ``lpips.LPIPS`` state_dict."""
    if path.endswith(".npz"):
        return load_npz(path)
    return load_torch_weights(lpips_full_path=path)


def params_from_env(env_vars=("CISTA_LPIPS", "CISTA_LPIPS_ALEX",
                              "CISTA_LPIPS_VGG")) -> dict | None:
    """Resolve LPIPS weights from the documented env-var handoff (this image
    has zero egress, so weights must be provided as files; ref default net is
    'alex': loss.py:307, utils/evaluate.py:51). Returns None when unset."""
    import os
    for var in env_vars:
        path = os.environ.get(var)
        if path and os.path.exists(path):
            params = load_weights(path)
            print(f"Loaded LPIPS weights from {var}={path} "
                  f"({len(params['convs'])} convs)")
            return params
    return None
