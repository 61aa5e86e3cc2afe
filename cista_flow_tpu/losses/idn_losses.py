"""IDNet's auxiliary flow losses (JAX, NHWC).

Equivalents of the reference's vendored idn/loss.py (unused by the shipped
entry points but part of the capability surface): masked sparse L1/L-norm
sequence losses, Charbonnier, 8-connected smoothness, and the NPE metric.
"""
from __future__ import annotations

import jax.numpy as jnp


def sparse_l1(estimated, ground_truth, valid_mask=None):
    """Masked L1 (ref: idn/loss.py:16-44); zero when the mask is empty."""
    diff = jnp.abs(estimated - ground_truth)
    if valid_mask is None:
        return jnp.mean(diff)
    m = jnp.broadcast_to(valid_mask.astype(bool), diff.shape)
    cnt = jnp.sum(m)
    return jnp.where(cnt > 0, jnp.sum(jnp.where(m, diff, 0.0)) /
                     jnp.maximum(cnt, 1), 0.0)


def sparse_l1_seq(estimated, ground_truth, valid_mask=None):
    """Mean masked L1 over a sequence (ref: idn/loss.py:4-13)."""
    n = len(estimated)
    masks = valid_mask if valid_mask is not None else [None] * n
    total = 0.0
    for e, g, m in zip(estimated, ground_truth, masks):
        total = total + sparse_l1(e, g, m)
    return total / n


def sparse_lnorm(order, estimated, ground_truth, valid_mask=None):
    """Masked per-pixel L-norm over the channel axis (channel-last here;
    ref: idn/loss.py:46-89 uses dim=1 on NCHW)."""
    diff = jnp.linalg.norm(estimated - ground_truth, ord=order, axis=-1,
                           keepdims=True)
    if valid_mask is None:
        return jnp.mean(diff)
    m = jnp.broadcast_to(valid_mask.astype(bool), diff.shape)
    cnt = jnp.sum(m)
    return jnp.where(cnt > 0, jnp.sum(jnp.where(m, diff, 0.0)) /
                     jnp.maximum(cnt, 1), 0.0)


def charbonnier_loss(delta, alpha: float = 0.45, epsilon: float = 1e-3):
    """Robust Charbonnier (ref: idn/loss.py:92-97)."""
    return jnp.mean((delta**2 + epsilon**2) ** alpha)


def smoothness_loss(flow):
    """8-connected local smoothness (ref: idn/loss.py:100-122).
    flow: (..., H, W, C) channel-last."""
    l = flow[..., :, 1:, :]
    r = flow[..., :, :-1, :]
    u = flow[..., 1:, :, :]
    d = flow[..., :-1, :, :]
    ul = flow[..., 1:, 1:, :]
    dr = flow[..., :-1, :-1, :]
    dl = flow[..., :-1, 1:, :]
    ur = flow[..., 1:, :-1, :]
    return (charbonnier_loss(l - r) + charbonnier_loss(u - d)
            + charbonnier_loss(ul - dr) + charbonnier_loss(dl - ur)) / 4.0


def npe(n, estimated, ground_truth, valid_mask=None):
    """Fraction of pixels with endpoint error >= n px (ref: idn/loss.py:125-145)."""
    err = jnp.linalg.norm(estimated - ground_truth, axis=-1, keepdims=True)
    if valid_mask is None:
        return jnp.mean((err >= n).astype(jnp.float32))
    m = jnp.broadcast_to(valid_mask.astype(bool), err.shape)
    cnt = jnp.maximum(jnp.sum(m), 1)
    return jnp.sum(jnp.where(m, (err >= n).astype(jnp.float32), 0.0)) / cnt
