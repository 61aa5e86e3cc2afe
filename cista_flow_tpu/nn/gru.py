"""RAFT update blocks: motion encoders, ConvGRU / SepConvGRU, flow heads (NHWC).

ref: DCEIFlow/core/decoder/with_event_updater.py (event-conditioned variants),
ERAFT/update.py (event-free variants), idn/update.py (LiteUpdateBlock).
All convs zero-padded (torch default).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import conv as C


# ------------------------- FlowHead -----------------------------------------

def flow_head_init(key, input_dim, hidden_dim):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": C.conv_params(k1, 3, 3, input_dim, hidden_dim),
        "conv2": C.conv_params(k2, 3, 3, hidden_dim, 2),
    }


def flow_head(p, x):
    return C.apply_conv(p["conv2"], jax.nn.relu(C.apply_conv(p["conv1"], x, padding=1)), padding=1)


# ------------------------- ConvGRU ------------------------------------------

def conv_gru_init(key, hidden_dim, input_dim):
    ks = jax.random.split(key, 3)
    cin = hidden_dim + input_dim
    return {
        "convz": C.conv_params(ks[0], 3, 3, cin, hidden_dim),
        "convr": C.conv_params(ks[1], 3, 3, cin, hidden_dim),
        "convq": C.conv_params(ks[2], 3, 3, cin, hidden_dim),
    }


def conv_gru(p, h, x):
    """3x3 ConvGRU (ref: ERAFT/update.py ConvGRU).

    The z and r convs consume the same cat(h, x), so they run as ONE conv
    with concatenated output channels — exactly the sep_conv_gru trick;
    weights stay separate in the param tree for checkpoint parity. At the
    RAFT/ERAFT 12-iteration updater this halves the gate-conv pass count
    on the pass-bound 1/8-res region."""
    hx = jnp.concatenate([h, x], axis=-1)
    w = jnp.concatenate([p["convz"]["w"], p["convr"]["w"]], axis=-1)
    b = jnp.concatenate([p["convz"]["b"], p["convr"]["b"]], axis=-1)
    zr = jax.nn.sigmoid(C.conv2d(hx, w, b, padding=(1, 1)))
    nh = h.shape[-1]
    z, r = zr[..., :nh], zr[..., nh:]
    q = jnp.tanh(C.apply_conv(p["convq"], jnp.concatenate([r * h, x], axis=-1), padding=1))
    return (1 - z) * h + z * q


# ------------------------- SepConvGRU ---------------------------------------

def sep_conv_gru_init(key, hidden_dim, input_dim):
    ks = jax.random.split(key, 6)
    cin = hidden_dim + input_dim
    mk = lambda k, kh, kw: C.conv_params(k, kh, kw, cin, hidden_dim)
    return {
        "convz1": mk(ks[0], 1, 5), "convr1": mk(ks[1], 1, 5), "convq1": mk(ks[2], 1, 5),
        "convz2": mk(ks[3], 5, 1), "convr2": mk(ks[4], 5, 1), "convq2": mk(ks[5], 5, 1),
    }


def sep_conv_gru(p, h, x):
    """Separable 1x5 then 5x1 GRU (ref: with_event_updater.py:35-67).

    The z and r convs consume the same cat(h, x), so they run as ONE conv
    with concatenated output channels (fewer, larger MXU ops; weights are
    kept separate in the param tree for checkpoint parity)."""
    for suffix, pad in (("1", (0, 2)), ("2", (2, 0))):
        hx = jnp.concatenate([h, x], axis=-1)
        pz, pr = p["convz" + suffix], p["convr" + suffix]
        w = jnp.concatenate([pz["w"], pr["w"]], axis=-1)
        b = jnp.concatenate([pz["b"], pr["b"]], axis=-1)
        zr = jax.nn.sigmoid(C.conv2d(hx, w, b, padding=pad))
        nh = h.shape[-1]
        z, r = zr[..., :nh], zr[..., nh:]
        q = jnp.tanh(C.apply_conv(
            p["convq" + suffix], jnp.concatenate([r * h, x], axis=-1), padding=pad))
        h = (1 - z) * h + z * q
    return h


# ------------------------- Motion encoders ----------------------------------

def basic_motion_encoder_event_init(key, cor_planes):
    """Event-conditioned motion encoder (ref: with_event_updater.py:90-112)."""
    ks = jax.random.split(key, 7)
    return {
        "convc1": C.conv_params(ks[0], 1, 1, cor_planes, 256),
        "convc2": C.conv_params(ks[1], 3, 3, 256, 192),
        "conve1": C.conv_params(ks[2], 1, 1, 256, 128),
        "conve2": C.conv_params(ks[3], 3, 3, 128, 64),
        "convf1": C.conv_params(ks[4], 7, 7, 2, 128),
        "convf2": C.conv_params(ks[5], 3, 3, 128, 64),
        "conv": C.conv_params(ks[6], 3, 3, 64 + 192 + 64, 128 - 2),
    }


def encode_event_motion_features(p, emap):
    """conve1/conve2 branch of the event motion encoder. The event features
    are invariant across the GRU iterations, and XLA cannot hoist work out
    of a ``lax.scan`` body — callers compute this ONCE before the scan and
    pass the result as ``ema`` (ref runs it per iteration:
    with_event_updater.py:99-100)."""
    ema = jax.nn.relu(C.apply_conv(p["conve1"], emap))
    return jax.nn.relu(C.apply_conv(p["conve2"], ema, padding=1))


def basic_motion_encoder_event(p, flow, emap, corr, corr_projected=False,
                               ema_precomputed=False):
    # corr_projected: corr already carries relu(convc1(lookup)) — fused into
    # the Pallas lookup kernel on the serving path (ops/pallas_corr.py).
    cor = corr if corr_projected else jax.nn.relu(
        C.apply_conv(p["convc1"], corr))
    cor = jax.nn.relu(C.apply_conv(p["convc2"], cor, padding=1))
    ema = emap if ema_precomputed else encode_event_motion_features(p, emap)
    flo = jax.nn.relu(C.apply_conv(p["convf1"], flow, padding=3))
    flo = jax.nn.relu(C.apply_conv(p["convf2"], flo, padding=1))
    out = jax.nn.relu(C.apply_conv(
        p["conv"], jnp.concatenate([cor, ema, flo], axis=-1), padding=1))
    return jnp.concatenate([out, flow], axis=-1)


def precompute_update_ema(p, emap):
    """Scan-invariant event features for basic_update_block_event, in the
    update block's compute dtype."""
    return encode_event_motion_features(p["encoder"], emap)


def basic_motion_encoder_init(key, cor_planes):
    """Event-free motion encoder (ref: ERAFT/update.py:63-81)."""
    ks = jax.random.split(key, 5)
    return {
        "convc1": C.conv_params(ks[0], 1, 1, cor_planes, 256),
        "convc2": C.conv_params(ks[1], 3, 3, 256, 192),
        "convf1": C.conv_params(ks[2], 7, 7, 2, 128),
        "convf2": C.conv_params(ks[3], 3, 3, 128, 64),
        "conv": C.conv_params(ks[4], 3, 3, 64 + 192, 128 - 2),
    }


def basic_motion_encoder(p, flow, corr, corr_projected=False):
    cor = corr if corr_projected else jax.nn.relu(
        C.apply_conv(p["convc1"], corr))
    cor = jax.nn.relu(C.apply_conv(p["convc2"], cor, padding=1))
    flo = jax.nn.relu(C.apply_conv(p["convf1"], flow, padding=3))
    flo = jax.nn.relu(C.apply_conv(p["convf2"], flo, padding=1))
    out = jax.nn.relu(C.apply_conv(
        p["conv"], jnp.concatenate([cor, flo], axis=-1), padding=1))
    return jnp.concatenate([out, flow], axis=-1)


# ------------------------- Update blocks ------------------------------------

def mask_head_init(key, hidden_dim, out_ch):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": C.conv_params(k1, 3, 3, hidden_dim, 256),
        "conv2": C.conv_params(k2, 1, 1, 256, out_ch),
    }


def mask_head(p, x):
    return C.apply_conv(p["conv2"], jax.nn.relu(C.apply_conv(p["conv1"], x, padding=1)))


def fused_head_stage1(heads, x):
    """relu(conv1(x)) for several heads reading the SAME input, as ONE conv.

    flow_head and mask_head conv1s are all 3x3 pad-1 over the updater's
    ``net``; concatenating output channels turns N pass-bound 1/8-res
    launches into one (weights stay separate in the param tree for
    checkpoint parity). Returns the per-head activations."""
    w = jnp.concatenate([h["conv1"]["w"] for h in heads], axis=-1)
    b = jnp.concatenate([h["conv1"]["b"] for h in heads], axis=-1)
    y = jax.nn.relu(C.conv2d(x, w, b, padding=(1, 1)))
    outs, o = [], 0
    for h in heads:
        n = h["conv1"]["w"].shape[-1]
        outs.append(y[..., o:o + n])
        o += n
    return outs


def basic_update_block_event_init(key, cor_planes, hidden_dim=128):
    """DCEIFlow's BasicUpdateBlockNoMask (ref: with_event_updater.py:156-171)."""
    ks = jax.random.split(key, 3)
    return {
        "encoder": basic_motion_encoder_event_init(ks[0], cor_planes),
        "gru": sep_conv_gru_init(ks[1], hidden_dim, 128 + hidden_dim),
        "flow_head": flow_head_init(ks[2], hidden_dim, 256),
    }


def basic_update_block_event(p, net, inp, corr, emap, flow,
                             corr_projected=False, ema_precomputed=False):
    # corr is built in fp32 (MXU accumulate); flows stay fp32 for sub-pixel
    # accuracy — cast both to the compute dtype at the block boundary so the
    # scan carry keeps one dtype in bf16 mode.
    corr = corr.astype(net.dtype)
    flow = flow.astype(net.dtype)
    motion = basic_motion_encoder_event(p["encoder"], flow, emap, corr,
                                        corr_projected, ema_precomputed)
    net = sep_conv_gru(p["gru"], net, jnp.concatenate([inp, motion], axis=-1))
    return net, None, flow_head(p["flow_head"], net)


def basic_update_block_init(key, cor_planes, hidden_dim=128):
    """ERAFT's BasicUpdateBlock with upsample mask (ref: ERAFT/update.py:84-106)."""
    ks = jax.random.split(key, 4)
    return {
        "encoder": basic_motion_encoder_init(ks[0], cor_planes),
        "gru": sep_conv_gru_init(ks[1], hidden_dim, 128 + hidden_dim),
        "flow_head": flow_head_init(ks[2], hidden_dim, 256),
        "mask": mask_head_init(ks[3], 128, 64 * 9),
    }


def basic_update_block(p, net, inp, corr, flow, corr_projected=False):
    corr = corr.astype(net.dtype)
    flow = flow.astype(net.dtype)
    motion = basic_motion_encoder(p["encoder"], flow, corr, corr_projected)
    net = sep_conv_gru(p["gru"], net, jnp.concatenate([inp, motion], axis=-1))
    # separate heads on purpose: fusing the flow/mask conv1s into one conv
    # (round-4 0e45e36) measured e2e NEGATIVE for ERAFT serving — 560.2 vs
    # 573.8 fps without (3-rep medians, quiet chip; PERF.md round-5 A/Bs).
    # XLA already co-schedules the two small convs; the concat'd weight
    # defeated a better layout. The same-shaped fusion stays in IDNet's
    # lite updater where it measured neutral.
    delta_flow = flow_head(p["flow_head"], net)
    mask = 0.25 * mask_head(p["mask"], net)
    return net, mask, delta_flow


# ------------------------- Small update blocks ------------------------------

def small_motion_encoder_init(key, cor_planes):
    """Event-conditioned small motion encoder
    (ref: with_event_updater.py:70-87)."""
    ks = jax.random.split(key, 5)
    return {
        "convc1": C.conv_params(ks[0], 1, 1, cor_planes, 96),
        "conve1": C.conv_params(ks[1], 1, 1, 128, 64),
        "convf1": C.conv_params(ks[2], 7, 7, 2, 64),
        "convf2": C.conv_params(ks[3], 3, 3, 64, 32),
        "conv": C.conv_params(ks[4], 3, 3, 96 + 32 + 64, 80),
    }


def small_motion_encoder(p, flow, emap, corr):
    cor = jax.nn.relu(C.apply_conv(p["convc1"], corr))
    ema = jax.nn.relu(C.apply_conv(p["conve1"], emap))
    flo = jax.nn.relu(C.apply_conv(p["convf1"], flow, padding=3))
    flo = jax.nn.relu(C.apply_conv(p["convf2"], flo, padding=1))
    out = jax.nn.relu(C.apply_conv(
        p["conv"], jnp.concatenate([cor, ema, flo], axis=-1), padding=1))
    return jnp.concatenate([out, flow], axis=-1)


def small_update_block_init(key, cor_planes, hidden_dim=96):
    """SmallUpdateBlock (ref: with_event_updater.py:115-128)."""
    ks = jax.random.split(key, 3)
    return {
        "encoder": small_motion_encoder_init(ks[0], cor_planes),
        "gru": conv_gru_init(ks[1], hidden_dim, 82 + 64),
        "flow_head": flow_head_init(ks[2], hidden_dim, 128),
    }


def small_update_block(p, net, inp, corr, emap, flow):
    corr = corr.astype(net.dtype)
    flow = flow.astype(net.dtype)
    motion = small_motion_encoder(p["encoder"], flow, emap, corr)
    net = conv_gru(p["gru"], net, jnp.concatenate([inp, motion], axis=-1))
    return net, None, flow_head(p["flow_head"], net)


# ------------------------- IDNet LiteUpdateBlock ----------------------------

def lite_update_block_init(key, hidden_dim, input_dim, num_outputs=2, downsample=8):
    """ref: idn/update.py:47-64."""
    ks = jax.random.split(key, 5)
    mdim = downsample * downsample * 9
    p = {
        "gru": conv_gru_init(ks[0], hidden_dim, input_dim),
        "flow_head": flow_head_init(ks[1], hidden_dim, hidden_dim),
        "mask": mask_head_init(ks[2], hidden_dim, mdim),
    }
    if num_outputs == 2:
        p["flow_head2"] = flow_head_init(ks[3], hidden_dim, hidden_dim)
        p["mask2"] = mask_head_init(ks[4], hidden_dim, mdim)
    return p
