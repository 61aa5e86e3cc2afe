"""Per-op trace of the flagship serving step on the real chip.

Usage: python profile_step.py [--by name|source|shape] [--top 30]
Writes the trace to /tmp/cista_trace and prints the leaf-op aggregation.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.models import composite
    from cista_flow_tpu.utils import trace_tools

    by = "name"
    top = 40
    for i, a in enumerate(sys.argv):
        if a == "--by":
            by = sys.argv[i + 1]
        if a == "--top":
            top = int(sys.argv[i + 1])

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    model = os.environ.get("BENCH_MODEL", "cista-eiflow")
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg = Config(model_mode=model, image_dim=(180, 240), dtype=dtype)
    h, w = cfg.image_dim
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    if dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    @jax.jit
    def step(params, mstate, events, rec, state):
        batch_data = {"event_voxel": events, "rec_img0": rec}
        if model == "cista-eraft":
            batch_data["event_voxel_old"] = events
        rec, _, state, _ = composite.apply(params, mstate, batch_data, state,
                                           cfg, collect_preds=False)
        return rec, state

    rng = np.random.default_rng(0)
    events = jnp.asarray(rng.standard_normal((batch, h, w, cfg.num_bins)), cdt)
    rec = jnp.zeros((batch, h, w, 1), cdt)
    state = jax.tree_util.tree_map(
        lambda x: x.astype(cdt), composite.zero_state(batch, cfg))

    rec1, state1 = step(params, mstate, events, rec, state)
    float(jnp.sum(rec1.astype(jnp.float32)))  # force

    runs = 5
    logdir = "/tmp/cista_trace"
    with jax.profiler.trace(logdir):
        r, s = rec, state
        for _ in range(runs):
            r, s = step(params, mstate, events, r, s)
        float(jnp.sum(r.astype(jnp.float32)))

    t0 = time.perf_counter()
    r, s = rec, state
    for _ in range(runs):
        r, s = step(params, mstate, events, r, s)
    float(jnp.sum(r.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(f"step: {dt / runs * 1e3:.1f} ms (batch {batch}; "
          f"{runs * batch / dt:.0f} fps)")
    trace_tools.print_summary(logdir, runs=runs, top=top, by=by)


if __name__ == "__main__":
    main()
