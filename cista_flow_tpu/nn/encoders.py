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

# The encoder-merge mode ("" off | "pair" merge fnet+enet | "trio" also
# cnet; trio measured e2e-negative — see PERF.md) is configuration, not
# ambient state: models read cfg.encoder_merge (configs.Config, env
# CISTA_TRIO honored there as a default override only).


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


# ------------------------- Fused encoder trio (serving) ---------------------
# DCEIFlow's three BasicEncoders (fnet: instance-norm on the image, enet:
# instance-norm on the voxels, cnet: batch-norm context — same architecture,
# same spatial shapes, independent weights) run as ONE channel-concat tower
# with BLOCK-DIAGONAL dense kernels. Chip-measured: a dense 128-ch conv runs
# at ~45% MFU vs ~15% for a 64-ch conv, so the 4x dense-MAC inflation of the
# zero blocks still wins ~1.5x (PERF.md "Encoder trio"); the per-channel
# norms merge exactly (instance stats on the fnet+enet slice, the eval-mode
# batch norm is a per-channel affine). Exact vs the separate towers; eval
# only (training batch-norm needs its own pass structure).
# ref towers: DCEIFlow/DCEIFlow.py:57-66 / raft_encoder.py:125-203.


def _blockdiag_w(ws):
    """Block-diagonal HWIO kernel over the (cin, cout) planes."""
    import jax.numpy as jnp
    cins = [w.shape[2] for w in ws]
    cols = []
    for i, w in enumerate(ws):
        before, after = sum(cins[:i]), sum(cins[i + 1:])
        cols.append(jnp.pad(w, ((0, 0), (0, 0), (before, after), (0, 0))))
    return jnp.concatenate(cols, axis=-1)


def _trio_conv(ps, x, stride=1, padding=0):
    import jax.numpy as jnp
    w = _blockdiag_w([p["w"] for p in ps])
    b = jnp.concatenate([p["b"] for p in ps])
    return C.conv2d(x, w, b, stride=stride, padding=padding)


def _trio_norm(x, c_each, bn_p, bn_st, eps=1e-5, relu=False):
    """Merged norm on a (B,H,W,n*c) tower-concat map: instance norm on the
    leading instance-tower channels (per-sample-per-channel, so the merge
    is exact), eval batch-norm affine on the trailing c when ``bn_p`` is
    given. One fused elementwise apply. Numerics match ops/conv.py's bf16
    ones-dot / f32 two-pass instance-norm paths and C.batch_norm eval."""
    import jax.numpy as jnp
    if bn_p is None:
        # pure instance-norm concat: identical to IN on the whole map —
        # route through the dispatcher (ones-dot / opt-in Pallas kernel)
        return C.instance_norm(x, eps, relu=relu)
    b, h, w_, ctot = x.shape
    cie = ctot - c_each
    x_ie = x[..., :cie]
    if x.dtype == jnp.bfloat16:
        x2 = x_ie.reshape(b, h * w_, cie)
        ones = jnp.ones((h * w_,), x.dtype)
        dn = (((0,), (1,)), ((), ()))
        s1 = jax.lax.dot_general(ones, x2, dn,
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(ones, x2 * x2, dn,
                                 preferred_element_type=jnp.float32)
        n = float(h * w_)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
    else:
        xf = x_ie.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2))
        var = jnp.var(xf, axis=(1, 2))
    inv = jax.lax.rsqrt(var + eps)                       # (B, cie)
    if bn_p is not None:
        bn_inv = jax.lax.rsqrt(bn_st["var"] + eps) * bn_p["scale"]   # (c,)
        bcast = lambda v: jnp.broadcast_to(v[None], (b, c_each))
        m = jnp.concatenate([mean, bcast(bn_st["mean"])], axis=-1)
        s = jnp.concatenate([inv, bcast(bn_inv)], axis=-1)
        o = jnp.concatenate([jnp.zeros_like(mean), bcast(bn_p["bias"])],
                            axis=-1)
        y = ((x - m[:, None, None, :].astype(x.dtype))
             * s[:, None, None, :].astype(x.dtype)
             + o[:, None, None, :].astype(x.dtype))
    else:
        y = ((x - mean[:, None, None, :].astype(x.dtype))
             * inv[:, None, None, :].astype(x.dtype))
    return jax.nn.relu(y) if relu else y


def _trio_residual_block(ps, pc, st_c, x, c_out, stride=1):
    """ps: list of instance-norm tower param dicts; pc/st_c: optional
    batch-norm tower params+state appended as the LAST tower."""
    allp = ps + ([pc] if pc is not None else [])
    np1 = (pc["norm1"], st_c["norm1"]) if pc is not None else (None, None)
    np2 = (pc["norm2"], st_c["norm2"]) if pc is not None else (None, None)
    y = _trio_conv([p["conv1"] for p in allp], x, stride=stride, padding=1)
    y = _trio_norm(y, c_out, np1[0], np1[1], relu=True)
    y = _trio_conv([p["conv2"] for p in allp], y, padding=1)
    y = _trio_norm(y, c_out, np2[0], np2[1], relu=True)
    if "down" in allp[0]:
        np3 = (pc["norm3"], st_c["norm3"]) if pc is not None else (None, None)
        x = _trio_conv([p["down"] for p in allp], x, stride=stride)
        x = _trio_norm(x, c_out, np3[0], np3[1])
    return jax.nn.relu(x + y)


def basic_encoder_multi(ps, pc, st_c, xs, ds=8):
    """Run several BasicEncoders as one block-diagonal tower.

    ps: instance-norm tower params (e.g. [fnet, enet]); pc/st_c: optional
    batch-norm tower (cnet) run in EVAL mode as the last tower; xs: the
    matching inputs (arbitrary channel counts). Returns one output map per
    tower, each (B, H/ds, W/ds, output_dim)."""
    import jax.numpy as jnp
    allp = ps + ([pc] if pc is not None else [])
    x = jnp.concatenate(xs, axis=-1)
    stride1 = 2 if ds == 8 else 1
    y = _trio_conv([p["conv1"] for p in allp], x, stride=stride1, padding=3)
    n1 = (pc["norm1"], st_c["norm1"]) if pc is not None else (None, None)
    y = _trio_norm(y, 64, n1[0], n1[1], relu=True)
    widths = {1: 64, 2: 96, 3: 128}
    strides = {1: 1, 2: 2, 3: 2}
    for i in (1, 2, 3):
        y = _trio_residual_block(
            [p[f"layer{i}a"] for p in ps],
            pc[f"layer{i}a"] if pc is not None else None,
            st_c[f"layer{i}a"] if pc is not None else None,
            y, widths[i], strides[i])
        y = _trio_residual_block(
            [p[f"layer{i}b"] for p in ps],
            pc[f"layer{i}b"] if pc is not None else None,
            st_c[f"layer{i}b"] if pc is not None else None,
            y, widths[i], 1)
    y = _trio_conv([p["conv2"] for p in allp], y)
    od = allp[0]["conv2"]["w"].shape[-1]
    return [y[..., i * od:(i + 1) * od] for i in range(len(allp))]


def basic_encoder_trio(p_f, p_e, p_c, st_c, x_f, x_e, x_c, ds=8):
    """fnet + enet + cnet(batch, EVAL) as one block-diagonal tower."""
    return tuple(basic_encoder_multi([p_f, p_e], p_c, st_c,
                                     [x_f, x_e, x_c], ds))


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
