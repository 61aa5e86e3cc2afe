"""Pooling ops (NHWC)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool, VALID padding (torch ``F.avg_pool2d(x, 2, 2)``).

    Odd trailing rows/cols are dropped, matching torch's floor-mode output.
    Used to build the correlation pyramid (ref: DCEIFlow/core/corr/raft_corr.py:27-30).
    """
    xf = x.astype(jnp.float32)
    s = jax.lax.reduce_window(
        xf, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return (s * 0.25).astype(x.dtype)
