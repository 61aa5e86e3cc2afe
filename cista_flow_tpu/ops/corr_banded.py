"""Banded packed-gather correlation lookup (experimental alternative).

The one-hot matmul lookup (ops/corr.py::lookup_corr) spends its time in
batched tiny GEMMs. This variant fetches each position's (2r+2)-row band
with ONE row-gather per axis by augmenting rows with shifted copies (the
same packing trick as the warp), then lerps adjacent rows/cols:

  stage 1: band_y[n]  = aug_rows[n, y0 + off]        (1 gather site / n)
           rows[n,a]  = (1-fy)·band_y[a] + fy·band_y[a+1]
  stage 2: band_x[n]  = aug_cols[n, x0 + off]        (1 gather site / n)
           win[n,a,b] = (1-fx)·band_x[b] + fx·band_x[b+1]

Zeros-padding semantics are exact: levels are zero-padded by (2r+2) on each
side so every band read is in-bounds, and centers so far out that clamping
would misalign the band are zeroed by a validity factor (their windows are
fully out of range).

MEASURED OUTCOME (TPU v5e, batch 32, 24x32 level-0): 51 ms vs 7.6 ms for the
one-hot matmul lookup — the shifted-concat augmentation writes ~10x the
pyramid to HBM per call, which swamps the gather savings. Kept as a tested
negative result; ops/corr.py::lookup_corr remains the production path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .corr import CorrPyramid


def _band_axis(values, center, r, axis_len):
    """Gather the (2r+2)-band along the leading spatial axis of ``values``.

    values: (n, S, K) — S = spatial axis to band, K = payload
    center: (n,) float coordinates along S (level units)
    Returns (band (n, 2r+2, K), frac (n,), valid (n,)).
    """
    n, S, K = values.shape
    b = 2 * r + 2
    c0 = jnp.floor(center)
    frac = center - c0
    lo, hi = -(r + 1.0), float(axis_len + r)
    valid = (c0 >= lo) & (c0 <= hi)
    c0c = jnp.clip(c0, lo, hi).astype(jnp.int32)

    # zero-pad by b on both sides, then build the shifted-concat augmentation:
    # aug[n, s] = values[n, s : s + b] flattened — one row-gather per n.
    vp = jnp.pad(values, ((0, 0), (b, b), (0, 0)))
    taps = [vp[:, i:i + S + b + 1] for i in range(b)]
    aug = jnp.concatenate(taps, axis=-1)  # (n, S+b+1, b*K)
    start = c0c + (b - r)  # padded index of row (c0 - r)
    g = jax.vmap(lambda a, s: jax.lax.dynamic_index_in_dim(
        a, s, axis=0, keepdims=False))(aug, start)
    band = g.reshape(n, b, K) * valid[:, None, None].astype(values.dtype)
    return band, frac.astype(values.dtype), valid


def lookup_corr_banded(pyr: CorrPyramid, coords: jnp.ndarray,
                       radius: int = 4) -> jnp.ndarray:
    """Drop-in for lookup_corr (same output, x-offset-major channels)."""
    r = radius
    B, H1, W1, _ = coords.shape
    n = B * H1 * W1
    cflat = coords.reshape(n, 2)
    w = 2 * r + 1

    out = []
    for i, level in enumerate(pyr.levels):
        _, hl, wl, _ = level.shape
        c = cflat / (2.0 ** i)
        lvl = level.reshape(n, hl, wl)

        band_y, fy, _ = _band_axis(lvl, c[:, 1], r, hl)      # (n, 2r+2, wl)
        rows = band_y[:, :w] * (1 - fy)[:, None, None] \
            + band_y[:, 1:] * fy[:, None, None]               # (n, 2r+1, wl)

        rows_t = rows.transpose(0, 2, 1)                      # (n, wl, 2r+1)
        band_x, fx, _ = _band_axis(rows_t, c[:, 0], r, wl)    # (n, 2r+2, 2r+1)
        win = band_x[:, :w] * (1 - fx)[:, None, None] \
            + band_x[:, 1:] * fx[:, None, None]               # (n, b=x, a=y)

        out.append(win.reshape(B, H1, W1, w * w))
    return jnp.concatenate(out, axis=-1)
