"""RAFT convex upsampling (NHWC).

Reproduces ``upsample_flow`` (ref: DCEIFlow/DCEIFlow.py:106-117,
ERAFT/eraft.py:77-88, idn/idedeq.py:48-61): a learned 9-way softmax over the
3x3 neighborhood of the coarse flow, broadcast to an (r x r) upsampling window
per coarse pixel.

Implementation note (TPU-first): torch uses ``F.unfold``; here the 9
neighborhood taps are built with static pad+slice (XLA fuses these into the
surrounding elementwise work — no gather needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighborhood9(x: jnp.ndarray) -> jnp.ndarray:
    """Stack the 3x3 zero-padded neighborhood: (B,H,W,C) -> (B,H,W,9,C).

    Tap order matches ``F.unfold`` row-major over (dy, dx) in {-1,0,1}².
    """
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C)))
    return jnp.stack(taps, axis=3)


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int, flow_scale: int | None = None) -> jnp.ndarray:
    """Upsample coarse flow (B,H,W,2) by ``factor`` with convex weights.

    mask: (B, H, W, 9*factor*factor) raw logits (pre-softmax).
    flow_scale: multiplier applied to the coarse flow before combination.
      DCEIFlow/ERAFT use ``factor`` (flow in units of coarse pixels);
      IDNet always multiplies by 8 regardless of its upsample ratio
      (ref: idn/idedeq.py:56). Defaults to ``factor``.
    """
    B, H, W, _ = flow.shape
    r = factor
    if flow_scale is None:
        flow_scale = factor
    # (B,H,W,9,2): 3x3 neighborhood of the scaled coarse flow
    nbr = _neighborhood9(flow * float(flow_scale))
    # torch: mask.view(N,1,9,r,r,H,W) from a (N, 9*r*r, H, W) tensor.
    # Our mask channels were imported NCHW->NHWC, so channel c = 9-index*r*r + window.
    m = mask.reshape(B, H, W, 9, r * r)
    m = jax.nn.softmax(m, axis=3)
    # combine: (B,H,W,r*r,2)
    up = jnp.einsum("bhwkr,bhwkc->bhwrc", m, nbr)
    up = up.reshape(B, H, W, r, r, 2)
    # interleave windows: (B, H, r, W, r, 2) -> (B, H*r, W*r, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * r, W * r, 2)
    return up
