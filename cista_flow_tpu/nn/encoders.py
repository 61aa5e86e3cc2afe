"""RAFT-family feature encoders (NHWC, functional).

BasicEncoder (ref: DCEIFlow/core/backbone/raft_encoder.py:125-203,
ERAFT/extractor.py:119-189) and LiteEncoder (ref: idn/extractor.py:63-125),
re-designed functionally. Norm selectable: 'instance' | 'batch' | 'group' |
'none'. BatchNorm running stats thread through a parallel ``state`` pytree
(mirrors the params tree; empty where no BN).

All convs are zero-padded (torch default), unlike the reflect-padded CISTA
layers.
"""
from __future__ import annotations

import jax

from ..ops import conv as C

KAIMING = "kaiming_normal_fan_out_relu"


def _norm_init(norm_fn: str, ch: int):
    """(params, state) for one norm site."""
    if norm_fn == "batch":
        return C.batch_norm_params(ch), C.batch_norm_state(ch)
    if norm_fn == "group":
        return C.group_norm_params(ch), {}
    return {}, {}  # instance / none: parameter-free


def _norm_apply(norm_fn: str, p, st, x, train, num_groups=8, relu=False):
    """Norm + (optionally) the trailing relu; the instance path fuses the
    relu into its Pallas kernel (ops/pallas_norm.py)."""
    if norm_fn == "batch":
        y, st = C.batch_norm(p, st, x, train)
    elif norm_fn == "instance":
        return C.instance_norm(x, relu=relu), st
    elif norm_fn == "group":
        y = C.group_norm(p, x, num_groups)
    else:
        y = x
    return (jax.nn.relu(y) if relu else y), st


# ------------------------- ResidualBlock ------------------------------------

def residual_block_init(key, cin, cout, norm_fn, stride=1):
    ks = jax.random.split(key, 3)
    p, s = {}, {}
    p["conv1"] = C.conv_params(ks[0], 3, 3, cin, cout, init=KAIMING)
    p["conv2"] = C.conv_params(ks[1], 3, 3, cout, cout, init=KAIMING)
    p["norm1"], s["norm1"] = _norm_init(norm_fn, cout)
    p["norm2"], s["norm2"] = _norm_init(norm_fn, cout)
    if stride != 1:
        p["down"] = C.conv_params(ks[2], 1, 1, cin, cout, init=KAIMING)
        p["norm3"], s["norm3"] = _norm_init(norm_fn, cout)
    return p, s


def residual_block(p, st, x, norm_fn, stride=1, train=False):
    ng = max(p["conv1"]["w"].shape[-1] // 8, 1)
    y = C.apply_conv(p["conv1"], x, stride=stride, padding=1)
    y, n1 = _norm_apply(norm_fn, p["norm1"], st.get("norm1", {}), y, train, ng,
                        relu=True)
    y = C.apply_conv(p["conv2"], y, padding=1)
    y, n2 = _norm_apply(norm_fn, p["norm2"], st.get("norm2", {}), y, train, ng,
                        relu=True)
    new_st = {"norm1": n1, "norm2": n2}
    if "down" in p:
        x = C.apply_conv(p["down"], x, stride=stride)
        x, n3 = _norm_apply(norm_fn, p["norm3"], st.get("norm3", {}), x, train, ng)
        new_st["norm3"] = n3
    return jax.nn.relu(x + y), new_st


# ------------------------- BasicEncoder -------------------------------------

def basic_encoder_init(key, input_dim, output_dim, norm_fn, ds=8):
    """RAFT BasicEncoder: 7x7 head (stride 2 iff ds==8) + 3 residual stages
    (64/96/128) + 1x1 out conv (ref: raft_encoder.py:125-177)."""
    ks = jax.random.split(key, 9)
    p, s = {}, {}
    p["conv1"] = C.conv_params(ks[0], 7, 7, input_dim, 64, init=KAIMING)
    p["norm1"], s["norm1"] = _norm_init(norm_fn, 64)
    dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
    for i, (cin, cout, stride) in enumerate(dims, start=1):
        p[f"layer{i}a"], s[f"layer{i}a"] = residual_block_init(ks[2 * i - 1], cin, cout, norm_fn, stride)
        p[f"layer{i}b"], s[f"layer{i}b"] = residual_block_init(ks[2 * i], cout, cout, norm_fn, 1)
    p["conv2"] = C.conv_params(ks[7], 1, 1, 128, output_dim, init=KAIMING)
    return p, s


def basic_encoder(p, st, x, norm_fn, ds=8, train=False):
    new_st = {}
    stride1 = 2 if ds == 8 else 1
    y = C.apply_conv(p["conv1"], x, stride=stride1, padding=3)
    y, new_st["norm1"] = _norm_apply(norm_fn, p["norm1"], st.get("norm1", {}),
                                     y, train, relu=True)
    strides = {1: 1, 2: 2, 3: 2}
    for i in (1, 2, 3):
        y, new_st[f"layer{i}a"] = residual_block(
            p[f"layer{i}a"], st.get(f"layer{i}a", {}), y, norm_fn, strides[i], train)
        y, new_st[f"layer{i}b"] = residual_block(
            p[f"layer{i}b"], st.get(f"layer{i}b", {}), y, norm_fn, 1, train)
    y = C.apply_conv(p["conv2"], y)
    return y, new_st


# ------------------------- BottleneckBlock / SmallEncoder -------------------

def bottleneck_block_init(key, cin, cout, norm_fn, stride=1):
    """1x1 -> 3x3 -> 1x1 bottleneck (ref: raft_encoder.py:62-122)."""
    ks = jax.random.split(key, 4)
    p, s = {}, {}
    p["conv1"] = C.conv_params(ks[0], 1, 1, cin, cout // 4, init=KAIMING)
    p["conv2"] = C.conv_params(ks[1], 3, 3, cout // 4, cout // 4, init=KAIMING)
    p["conv3"] = C.conv_params(ks[2], 1, 1, cout // 4, cout, init=KAIMING)
    p["norm1"], s["norm1"] = _norm_init(norm_fn, cout // 4)
    p["norm2"], s["norm2"] = _norm_init(norm_fn, cout // 4)
    p["norm3"], s["norm3"] = _norm_init(norm_fn, cout)
    if stride != 1:
        p["down"] = C.conv_params(ks[3], 1, 1, cin, cout, init=KAIMING)
        p["norm4"], s["norm4"] = _norm_init(norm_fn, cout)
    return p, s


def bottleneck_block(p, st, x, norm_fn, stride=1, train=False):
    ng = max(p["conv3"]["w"].shape[-1] // 8, 1)
    y = C.apply_conv(p["conv1"], x)
    y, n1 = _norm_apply(norm_fn, p["norm1"], st.get("norm1", {}), y, train, ng,
                        relu=True)
    y = C.apply_conv(p["conv2"], y, stride=stride, padding=1)
    y, n2 = _norm_apply(norm_fn, p["norm2"], st.get("norm2", {}), y, train, ng,
                        relu=True)
    y = C.apply_conv(p["conv3"], y)
    y, n3 = _norm_apply(norm_fn, p["norm3"], st.get("norm3", {}), y, train, ng,
                        relu=True)
    new_st = {"norm1": n1, "norm2": n2, "norm3": n3}
    if "down" in p:
        x = C.apply_conv(p["down"], x, stride=stride)
        x, n4 = _norm_apply(norm_fn, p["norm4"], st.get("norm4", {}), x, train, ng)
        new_st["norm4"] = n4
    return jax.nn.relu(x + y), new_st


def small_encoder_init(key, input_dim, output_dim, norm_fn):
    """RAFT SmallEncoder: 32/64/96 bottleneck stages
    (ref: raft_encoder.py:206-255)."""
    ks = jax.random.split(key, 8)
    p, s = {}, {}
    p["conv1"] = C.conv_params(ks[0], 7, 7, input_dim, 32, init=KAIMING)
    p["norm1"], s["norm1"] = _norm_init(norm_fn, 32)
    dims = [(32, 32, 1), (32, 64, 2), (64, 96, 2)]
    for i, (cin, cout, stride) in enumerate(dims, start=1):
        p[f"layer{i}a"], s[f"layer{i}a"] = bottleneck_block_init(
            ks[2 * i - 1], cin, cout, norm_fn, stride)
        p[f"layer{i}b"], s[f"layer{i}b"] = bottleneck_block_init(
            ks[2 * i], cout, cout, norm_fn, 1)
    p["conv2"] = C.conv_params(ks[7], 1, 1, 96, output_dim, init=KAIMING)
    return p, s


def small_encoder(p, st, x, norm_fn, train=False):
    new_st = {}
    y = C.apply_conv(p["conv1"], x, stride=2, padding=3)
    y, new_st["norm1"] = _norm_apply(norm_fn, p["norm1"], st.get("norm1", {}),
                                     y, train, relu=True)
    strides = {1: 1, 2: 2, 3: 2}
    for i in (1, 2, 3):
        y, new_st[f"layer{i}a"] = bottleneck_block(
            p[f"layer{i}a"], st.get(f"layer{i}a", {}), y, norm_fn,
            strides[i], train)
        y, new_st[f"layer{i}b"] = bottleneck_block(
            p[f"layer{i}b"], st.get(f"layer{i}b", {}), y, norm_fn, 1, train)
    return C.apply_conv(p["conv2"], y), new_st


# ------------------------- LiteEncoder (IDNet) ------------------------------

def lite_encoder_init(key, n_first_channels, output_dim, stride=2):
    """IDNet LiteEncoder, norm 'none' (ref: idn/extractor.py:63-104)."""
    ks = jax.random.split(key, 5)
    p = {"conv1": C.conv_params(ks[0], 7, 7, n_first_channels, output_dim, init=KAIMING)}
    if stride == 2:
        dims = [(output_dim, output_dim, 2), (output_dim, output_dim * 2, 2)]
    else:
        dims = [(output_dim, output_dim * 2, 2), (output_dim * 2, output_dim * 2, 1)]
    for i, (cin, cout, s_) in enumerate(dims, start=1):
        p[f"layer{i}a"], _ = residual_block_init(ks[2 * i - 1], cin, cout, "none", s_)
        p[f"layer{i}b"], _ = residual_block_init(ks[2 * i], cout, cout, "none", 1)
    return p, [s_ for (_, _, s_) in dims]


def lite_encoder(p, x, stage_strides):
    y = jax.nn.relu(C.apply_conv(p["conv1"], x, stride=2, padding=3))
    for i, s_ in enumerate(stage_strides, start=1):
        y, _ = residual_block(p[f"layer{i}a"], {}, y, "none", s_)
        y, _ = residual_block(p[f"layer{i}b"], {}, y, "none", 1)
    return y
