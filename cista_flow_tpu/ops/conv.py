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

import os as _os

from . import pallas_conv as _pconv

_REFLECT_EDGE = _os.environ.get("CISTA_REFLECT_EDGE", "0") == "1"
_NORM_DOT = _os.environ.get("CISTA_NORM_DOT", "1") == "1"


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

    kh, kw, cin_g, cout = w.shape
    # TPU fast paths (exact — the same MACs regrouped):
    # * tiny-Cout convs starve the MXU lane dim (<2% MFU for Cout=1); one
    #   1x1 GEMM to kh*kw*Cout channels + shifted adds is ~6x faster, and
    #   the 1x1 commutes with padding so only the 9-channel map gets padded.
    # * stride-2 3x3 convs hit a pathological XLA emitter case (~4% MFU);
    #   the four 2x2-phase stride-1 convs partition the taps exactly.
    if groups == 1 and cout <= 4 and cin_g >= 16:
        return _conv_tapsum(x, w, b, stride, (ph, pw), padding_mode)

    # (A tiny-Cin im2col fast path — patches on lanes, one deep dot — was
    # measured CATASTROPHIC in-graph: 24.9 ms/step vs ~1 ms for the convs
    # it replaced; the non-128-aligned lane concat repacks every patch.
    # Tiny-Cin pass-boundedness is attacked structurally instead, via the
    # space-to-depth head path in ops/s2d.py.)

    # * square C->C 3x3 convs MAY route to the im2col Pallas kernel
    #   (contraction depth 9C fills the MXU where XLA's per-tap contraction
    #   runs at ~(C/128)^2 MFU): measured 1.4x at 64ch, 1.1x at 128ch
    #   standalone on-chip, but NET NEGATIVE in the full graph (fusion
    #   barrier + layout transitions; see pallas_conv.py) — default off,
    #   opt-in via CISTA_PALLAS_CONV=1. Under autodiff the custom_vjp runs
    #   the XLA twin instead (pallas_conv._fwd).
    if (_pconv.ENABLED and groups == 1 and (kh, kw) == (3, 3)
            and tuple(stride) == (1, 1) and (ph, pw) == (1, 1)
            and x.dtype == jnp.bfloat16 and cin_g == cout
            and cout in _pconv.CHANNELS and _pconv.supported(x.shape, w.shape)):
        return _pconv.conv3x3(x, w, b, padding_mode)

    # reflect-padded stride-1 3x3 convs (all CISTA layers) without
    # materializing the padded tensor: zero-padding fuses into the XLA conv
    # for free, and the reflect-vs-zero difference lives only on the 1-pixel
    # border — added back exactly via four strip convolutions. Off by
    # default: the first (DUS-based) variant measured a net e2e regression;
    # the lax.pad variant is pending TPU measurement (set
    # CISTA_REFLECT_EDGE=1 to enable).
    if (_REFLECT_EDGE and padding_mode == "reflect" and groups == 1
            and (kh, kw) == (3, 3) and tuple(stride) == (1, 1)
            and (ph, pw) == (1, 1) and x.shape[1] >= 2 and x.shape[2] >= 2
            and (cout > cin_g or x.shape[1] * x.shape[2] >= 30000)):
        return _conv_reflect_edge(x, w, b)

    if padding_mode == "reflect" and (ph or pw):
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
        ph = pw = 0

    if groups == 1:
        if (not (ph or pw) and tuple(stride) == (2, 2) and (kh, kw) == (3, 3)
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and cin_g >= 16):
            return _conv_s2_phases(x, w, b)

    # No explicit preferred_element_type: TPU convs accumulate fp32 on the
    # MXU regardless, and requesting f32 output from bf16 operands breaks the
    # conv transpose (gradient) dtype rules.
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=tuple(stride),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=DIMS,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv_tapsum(x: jnp.ndarray, w: jnp.ndarray, b, stride, padding,
                 padding_mode: str) -> jnp.ndarray:
    """Conv with Cout<=4 as ONE 1x1 GEMM to kh*kw*Cout channels followed by
    kh*kw shifted adds.

    The MXU pads Cout to 128 lanes, so a 64->1 conv runs at ~0.5% MFU;
    batching all taps' channel reductions into a single (.., Cin) @
    (Cin, kh*kw*Cout) contraction recovers a 9x wider GEMM, and the
    leftover spatial taps are cheap f32 shifted adds. The 1x1 is pointwise,
    so it commutes with (reflect or zero) padding — only the kh*kw*Cout-
    channel map is padded, not the Cin-channel input."""
    kh, kw, cin, cout = w.shape
    sy, sx = stride
    ph, pw = padding
    # (cin, kh*kw*cout), tap-major
    wr = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, kh * kw * cout)
    t = jax.lax.dot_general(
        x, wr.astype(x.dtype),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (B, H, W, kh*kw*cout)
    if ph or pw:
        mode = "reflect" if padding_mode == "reflect" else "constant"
        t = jnp.pad(t, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)
    B, HP, WP, _ = t.shape
    H = (HP - kh) // sy + 1
    W = (WP - kw) // sx + 1
    acc = None
    for i in range(kh):
        for j in range(kw):
            k = (i * kw + j) * cout
            sl = jax.lax.slice(
                t, (0, i, j, k),
                (B, i + (H - 1) * sy + 1, j + (W - 1) * sx + 1, k + cout),
                (1, sy, sx, 1))
            acc = sl if acc is None else acc + sl
    out = acc.astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv_reflect_edge(x: jnp.ndarray, w: jnp.ndarray, b) -> jnp.ndarray:
    """Reflect-padded SAME 3x3 conv as a zero-padded conv + exact border fix.

    An explicit ``jnp.pad(mode='reflect')`` costs an HBM round trip of the
    whole activation per conv (~5 ms/step across CISTA's layers, PERF.md);
    zero padding instead fuses into the convolution. The difference is only
    where a tap crosses the border: reflect reads row/col 1 (resp. S-2)
    where zero reads 0. Those contributions are added back with four strip
    convolutions:

    * top/bottom rows: kernel row 0 (resp. 2) convolved over input row 1
      (resp. H-2), reflect-padded along W — which also reproduces the
      corner taps that are out-of-range in BOTH axes (padded corner
      (-1,-1) = x[1,1] = the reflected-W end of row 1);
    * left/right cols: kernel col 0 (resp. 2) over input col 1 (resp. W-2),
      ZERO-padded along H so the doubly-out-of-range corner taps are not
      counted twice.
    """
    B, H, W, C = x.shape
    cout = w.shape[-1]
    wd = w.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, wd, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=DIMS)

    def strip_conv(strip, kern, pad_mode):
        # strip: (B, L, C); kern: (3, C, cout) -> (B, L, cout)
        if pad_mode == "reflect":
            strip = jnp.concatenate(
                [strip[:, 1:2], strip, strip[:, -2:-1]], axis=1)
        else:
            strip = jnp.pad(strip, ((0, 0), (1, 1), (0, 0)))
        return jax.lax.conv_general_dilated(
            strip[:, None], kern[None], window_strides=(1, 1),
            padding="VALID", dimension_numbers=DIMS)[:, 0]

    top = strip_conv(x[:, 1], wd[0], "reflect")
    bot = strip_conv(x[:, H - 2], wd[2], "reflect")
    left = strip_conv(x[:, :, 1], wd[:, 0], "zeros")
    right = strip_conv(x[:, :, W - 2], wd[:, 2], "zeros")

    # place the border strips with interior-padding (dilation) pads — these
    # fuse into the final adds, unlike dynamic-update-slices which force
    # full-tensor rewrites (column DUS measured 2x the whole conv cost)
    zero = jnp.zeros((), out.dtype)
    rows = jnp.stack([top, bot], axis=1)              # (B, 2, W, cout)
    rows = jax.lax.pad(rows, zero, ((0, 0, 0), (0, 0, H - 2),
                                    (0, 0, 0), (0, 0, 0)))
    cols = jnp.stack([left, right], axis=2)           # (B, H, 2, cout)
    cols = jax.lax.pad(cols, zero, ((0, 0, 0), (0, 0, 0),
                                    (0, 0, W - 2), (0, 0, 0)))
    out = out + rows + cols
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv_s2_phases(x: jnp.ndarray, w: jnp.ndarray, b) -> jnp.ndarray:
    """VALID stride-2 3x3 conv as four stride-1 phase convolutions.

    XLA's TPU emitter handles this stride-2 case at ~4% MFU; splitting the
    input into its four 2x2 phases turns it into dense stride-1 convs whose
    taps partition the original 3x3 exactly (tap (dy,dx) belongs to phase
    (dy%2, dx%2) at kernel position (dy//2, dx//2))."""
    B, HP, WP, C = x.shape
    H, W = (HP - 3) // 2 + 1, (WP - 3) // 2 + 1
    out = None
    for py in (0, 1):
        for px in (0, 1):
            xp = x[:, py::2, px::2, :]
            wk = w[py::2, px::2]
            o = jax.lax.conv_general_dilated(
                xp, wk.astype(x.dtype), window_strides=(1, 1),
                padding="VALID", dimension_numbers=DIMS)[:, :H, :W]
            out = o if out is None else out + o
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


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  relu: bool = False) -> jnp.ndarray:
    """InstanceNorm2d with torch defaults (affine=False, no running stats),
    with an optionally fused trailing relu (``relu=True``).

    bf16 on TPU dispatches to a Pallas kernel that keeps each sample
    VMEM-resident (one HBM round trip for stats + normalize + relu,
    ops/pallas_norm.py); bf16 elsewhere computes the statistics as
    ones-vector MXU contractions (sum and sum-of-squares in one
    f32-accumulated pass each) instead of XLA reduce ops — measured A/B
    in the flagship graph (PERF.md). f32 keeps the two-pass mean/var form
    (exact torch-parity path)."""
    from . import pallas_norm as _pnorm
    if _pnorm.supported(x):
        return _pnorm.instance_norm_fused(x, eps, relu)
    if _pnorm.stats_supported(x):
        return _pnorm.instance_norm_statskernel(x, eps, relu)
    if x.dtype == jnp.bfloat16 and _NORM_DOT:
        b, h, w, c = x.shape
        x2 = x.reshape(b, h * w, c)
        ones = jnp.ones((h * w,), x.dtype)
        dn = (((0,), (1,)), ((), ()))
        s1 = jax.lax.dot_general(ones, x2, dn,
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(ones, x2 * x2, dn,
                                 preferred_element_type=jnp.float32)
        n = float(h * w)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        y = ((x - mean[:, None, None, :].astype(x.dtype))
             * inv[:, None, None, :].astype(x.dtype))
        return jax.nn.relu(y) if relu else y
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def group_norm_params(c: int) -> dict:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def group_norm(p: dict, x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)
