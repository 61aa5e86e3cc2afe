"""Shared predicate for the serving fast-path dispatch.

Every TPU-only serving optimization (s2d block convs, merged encoder
towers, Pallas corr lookup, ERAFT pair tower) engages under the same base
condition: the tensors are bfloat16 and the default backend is TPU. The
per-site config knobs stay at the call sites (they differ per feature);
this helper centralizes the backend/dtype predicate so the dispatch reads
the same everywhere (and so a future backend rename is one edit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tpu_bf16(*arrays) -> bool:
    """True iff all ``arrays`` are bfloat16 and we are executing on TPU."""
    return (all(a.dtype == jnp.bfloat16 for a in arrays)
            and jax.default_backend() == "tpu")
