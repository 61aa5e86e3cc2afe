"""Convolution + normalization primitives (NHWC / HWIO) for TPU.

Weights are stored HWIO so checkpoint import transposes torch OIHW once
(ckpt/torch_import.py). All convs lower to XLA convolutions that tile onto the
MXU; padding is either fused zero-padding or an explicit reflect pad
(the CISTA layers use reflect everywhere — ref: e2v/base_layers.py:142,48).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 0,
    padding_mode: str = "zeros",
    groups: int = 1,
) -> jnp.ndarray:
    """2D convolution. ``w``: (kh, kw, in/groups, out); ``padding`` int or (ph, pw)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    ph, pw = padding

    if padding_mode == "reflect" and (ph or pw):
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
        pad_cfg = "VALID"
    else:
        pad_cfg = ((ph, ph), (pw, pw))

    # No explicit preferred_element_type: TPU convs accumulate fp32 on the
    # MXU regardless, and requesting f32 output from bf16 operands breaks the
    # conv transpose (gradient) dtype rules.
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=tuple(stride),
        padding=pad_cfg,
        dimension_numbers=DIMS,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_params(
    key: jax.Array,
    kh: int,
    kw: int,
    cin: int,
    cout: int,
    bias: bool = True,
    groups: int = 1,
    init: str = "torch_default",
) -> dict:
    """Initialize conv params following torch conventions.

    'torch_default': kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    up to the gain; bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    'kaiming_normal_fan_out_relu': the RAFT encoders' explicit init
    (ref: DCEIFlow/core/backbone/raft_encoder.py:160-168).
    """
    kw_, kb_ = jax.random.split(key)
    fan_in = (cin // groups) * kh * kw
    fan_out = (cout // groups) * kh * kw
    shape = (kh, kw, cin // groups, cout)
    if init == "torch_default":
        gain = math.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu a=sqrt(5)
        bound = gain * math.sqrt(3.0 / fan_in)
        w = jax.random.uniform(kw_, shape, jnp.float32, -bound, bound)
    elif init == "kaiming_normal_fan_out_relu":
        std = math.sqrt(2.0 / fan_out)
        w = std * jax.random.normal(kw_, shape, jnp.float32)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        p["b"] = jax.random.uniform(kb_, (cout,), jnp.float32, -bound, bound)
    return p


def apply_conv(p: dict, x: jnp.ndarray, stride=1, padding=0, padding_mode="zeros", groups=1):
    return conv2d(x, p["w"], p.get("b"), stride, padding, padding_mode, groups)


# ---------------------------------------------------------------------------
# Normalization layers. BatchNorm threads running stats functionally.
# ---------------------------------------------------------------------------

def batch_norm_params(c: int) -> dict:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def batch_norm_state(c: int) -> dict:
    return {
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def batch_norm(
    p: dict,
    state: dict,
    x: jnp.ndarray,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """BatchNorm2d (torch semantics: biased var for normalization, unbiased
    var for the running average). Returns (y, new_state)."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + p["bias"].astype(x.dtype)
    return y, new_state


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d with torch defaults (affine=False, no running stats)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def group_norm_params(c: int) -> dict:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def group_norm(p: dict, x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)
