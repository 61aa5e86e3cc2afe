"""CISTA-LSTC: unrolled convolutional ISTA video reconstructor (NHWC, functional).

TPU-first re-design of the reference network (ref: e2v/e2v_model.py:10-98):
event/image heads -> stride-2 fusion -> ConvLSTC initial sparse code ->
``depth`` weight-tied ISTA iterations -> ConvLSTM decoder -> bilinear x2 ->
sigmoid. The recurrent state is an explicit 4-tensor tuple (never ``None``),
so a training step is a clean ``lax.scan`` carry.

State protocol (matches the reference list-of-3, with the (h, c) tuple
flattened): ``(lstc_cell, sparse_code, dg_hidden, dg_cell)``
(ref: e2v/e2v_model.py:65-92 — states[0], states[1], states[2]=(h,c)).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..ops import conv as C
from ..ops import pallas_ista2 as PI
from ..ops import s2d as S2D
from ..ops.fastpath import tpu_bf16


class CistaState(NamedTuple):
    lstc_cell: jnp.ndarray   # (B, H/2, W/2, 2C)
    sparse_code: jnp.ndarray  # (B, H/2, W/2, 2C) — warped between steps
    dg_hidden: jnp.ndarray   # (B, H/2, W/2, C)
    dg_cell: jnp.ndarray     # (B, H/2, W/2, C)


def init(key, cfg) -> dict:
    """cfg needs: num_bins, base_channels, depth."""
    c = cfg.base_channels
    ks = jax.random.split(key, 9)
    return {
        "We": L.conv_layer_init(ks[0], cfg.num_bins, c // 2),
        "Wi": L.conv_layer_init(ks[1], 1, c // 2),
        "W0": L.conv_layer_init(ks[2], c, c),
        "P0": L.conv_lstc_init(ks[3], x_size=c, z_size=2 * c, output_size=2 * c),
        "ista": L.ista_block_init(ks[4], base_channels=c),
        "Dg": {
            "conv": L.conv_layer_init(ks[5], 2 * c, c),
            "lstm": L.conv_lstm_init(ks[6], c, c),
        },
        "upsamp": L.conv_layer_init(ks[7], c, c),
        "final": L.conv_layer_init(ks[8], c, 1),
    }


def zero_state(batch: int, image_dim, base_channels: int, dtype=jnp.float32) -> CistaState:
    h2, w2 = image_dim[0] // 2, image_dim[1] // 2
    c = base_channels
    z = lambda ch: jnp.zeros((batch, h2, w2, ch), dtype)
    return CistaState(z(2 * c), z(2 * c), z(c), z(c))


def apply(params: dict, events: jnp.ndarray, prev_image: jnp.ndarray,
          state: CistaState, depth: int = 5, events_s2d=None):
    """One reconstruction step.

    events: (B, H, W, num_bins) voxel grid; prev_image: (B, H, W, 1) warped
    previous reconstruction. Returns (rec_image (B,H,W,1), new_state).

    ``events_s2d``: optional pre-packed ``space_to_depth(events)``
    (B, H/2, W/2, 4*bins) — serving loops pack the whole window's voxels in
    one amortized transpose instead of one per scan step; the head conv's
    kernel channels are permuted to match (ops/s2d.py cin_perm). Ignored
    off the s2d fast path.
    """
    # We/Wi fused into ONE conv on the concatenated input with a
    # block-diagonal kernel — exact (reflect padding is per-channel, and the
    # zero blocks contribute nothing), and one MXU dispatch instead of two
    # tiny-Cin ones (ref separate heads: e2v/e2v_model.py:69-70)
    we, wi = params["We"], params["Wi"]
    bins, half = we["w"].shape[2], we["w"].shape[3]
    kz = jnp.zeros((3, 3, bins + 1, half), we["w"].dtype)
    k_head = jnp.concatenate([
        kz.at[:, :, :bins].set(we["w"]),
        kz.at[:, :, bins:].set(wi["w"]),
    ], axis=-1)
    b_head = jnp.concatenate([we["b"], wi["b"]])
    head_in = jnp.concatenate([events, prev_image], axis=-1)

    # Full-res segment in space-to-depth form on the bf16 TPU path: the
    # head conv (Cin=6) and W0 (stride 2) are MXU-pass-bound at full res
    # (~2-5% MFU); block-recomposed convs with phases on lanes run the
    # same math 3-4x faster and W0's output exits the s2d domain exactly
    # at the model's own downsample — no unpack (ops/s2d.py, PERF.md).
    if (S2D.ENABLED and tpu_bf16(head_in)
            and head_in.shape[1] % 2 == 0 and head_in.shape[2] % 2 == 0):
        if events_s2d is not None:
            # channels arrive as [s2d(events) | s2d(prev_image)] — permute
            # the recomposed kernel instead of re-packing the voxels
            img_b = S2D.space_to_depth(prev_image)
            xb = jnp.concatenate([events_s2d, img_b], axis=-1)
            perm = ([p * (bins + 1) + c for p in range(4) for c in range(bins)]
                    + [p * (bins + 1) + bins for p in range(4)])
            hb = S2D.conv3x3_reflect_s2d(xb, k_head, b_head, cin_perm=perm)
        else:
            hb = S2D.conv3x3_reflect_s2d(
                S2D.space_to_depth(head_in), k_head, b_head)
        x1 = S2D.conv3x3s2_reflect_s2d_to_plain(
            hb, params["W0"]["w"], params["W0"]["b"])
    else:
        x1 = L.conv_layer({"w": k_head, "b": b_head}, head_in, padding=1)
        x1 = L.conv_layer(params["W0"], x1, stride=2, padding=1)

    z, lstc_cell = L.conv_lstc(params["P0"], x1, state.sparse_code, state.lstc_cell)

    # depth weight-tied ISTA iterations (ref: e2v/e2v_model.py:81-87).
    # CISTA_PALLAS_ISTA=1 opts bf16 serving into the fused Pallas loop —
    # measured e2e NEGATIVE (boundary fusion losses outweigh the in-segment
    # win; see ops/pallas_ista2.py docstring + PERF.md), so default off.
    # Training is unaffected either way: the kernel's custom_vjp runs the
    # XLA loop under differentiation. f32 stays on XLA (MXU rounding).
    if (PI.ENABLED and x1.dtype == jnp.bfloat16
            and PI.supported(x1.shape, z.shape)):
        # v3 kernel: the Dg conv + relu ride the same launch (the v2
        # post-mortem's boundary tax itemized Dg's standalone reflect pad
        # and lost epilogue fusion; v3 absorbs both)
        z, rec = PI.fused_ista_dg(params["ista"], params["Dg"]["conv"],
                                  x1, z, depth)
    else:
        for _ in range(depth):
            z = L.ista_iteration(params["ista"], x1, z)
        rec = L.conv_layer(params["Dg"]["conv"], z, padding=1,
                           activation="relu")
    sparse_code = z
    hidden, cell = L.conv_lstm(params["Dg"]["lstm"], rec, (state.dg_hidden, state.dg_cell))

    _, h, w, _ = events.shape
    if (S2D.DECODER and tpu_bf16(hidden)
            and h == 2 * hidden.shape[1] and w == 2 * hidden.shape[2]):
        # decoder in s2d form: phase-plane x2 resize (no full-res
        # interleave) -> VALID 2x2 block conv -> final 3x3 block conv ->
        # sigmoid -> one cheap depth_to_space on the 1-channel output
        rec_b = jax.nn.relu(S2D.upsample_conv_s2d(
            hidden, params["upsamp"]["w"], params["upsamp"]["b"]))
        rec_b = S2D.conv3x3_reflect_s2d(
            rec_b, params["final"]["w"], params["final"]["b"])
        rec = S2D.depth_to_space(jax.nn.sigmoid(rec_b))
    else:
        rec = L.upsample_conv_layer(params["upsamp"], hidden, out_hw=(h, w),
                                    activation="relu")
        rec = jax.nn.sigmoid(L.conv_layer(params["final"], rec, padding=1))

    return rec, CistaState(lstc_cell, sparse_code, hidden, cell)
