"""Virtual-mesh DP scaling evidence: loss equality + step time vs devices.

Runs the flagship train step at a FIXED global batch on 1/2/4/8 virtual CPU
devices and prints a table (recorded in PERF.md). Loss must be identical
across mesh sizes (DP is a pure reshard of the same computation); step time
on a virtual CPU mesh is only a sanity signal (all "devices" share one
host), the real scaling medium is ICI.

Usage: python scaling_table.py  (self-forces an 8-device CPU backend)
"""
from __future__ import annotations

import os
import subprocess
import sys


def _child() -> None:
    import time

    import numpy as np
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cista_flow_tpu import parallel
    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.models import composite

    cfg = Config(image_dim=(32, 48), model_mode="cista-eraft",
                 len_sequence=3, flow_iters=1)
    rng = np.random.default_rng(0)
    t_len, batch = 3, 8
    seq_host = {
        "event_voxel": rng.standard_normal(
            (t_len, batch, 32, 48, 5)).astype(np.float32),
        "event_voxel_old": rng.standard_normal(
            (t_len, batch, 32, 48, 5)).astype(np.float32),
        "gt_img0": rng.random((t_len, batch, 32, 48, 1)).astype(np.float32),
        "gt_img1": rng.random((t_len, batch, 32, 48, 1)).astype(np.float32),
        "gt_flow": (2 * rng.standard_normal(
            (t_len, batch, 32, 48, 2))).astype(np.float32),
    }

    import jax.numpy as jnp
    params0, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    opt = parallel.make_optimizer(1e-4)

    rows = []
    for n in (1, 2, 4, 8):
        mesh = parallel.make_mesh((n,), ("data",), jax.devices("cpu")[:n])
        params = parallel.replicate_tree(params0, mesh)
        ms = parallel.replicate_tree(mstate, mesh)
        opt_state = parallel.replicate_tree(opt.init(params0), mesh)
        seq = parallel.shard_seq_batch(seq_host, mesh)
        step = parallel.make_train_step(cfg, opt, "rec", None, False,
                                        mesh=mesh, donate=False)
        p, m, o, loss = step(params, ms, opt_state, seq)
        loss0 = float(loss)
        t0 = time.perf_counter()
        for _ in range(3):
            p, m, o, loss = step(params, ms, opt_state, seq)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / 3
        rows.append((n, loss0, dt * 1e3))
        print(f"devices={n}: loss={loss0:.6f} step={dt*1e3:.0f} ms")

    base = rows[0][1]
    for n, loss, _ in rows:
        assert abs(loss - base) < 1e-4 * max(1.0, abs(base)), \
            f"loss mismatch at {n} devices: {loss} vs {base}"
    print("loss identical across 1/2/4/8-device DP meshes (global batch 8)")


if __name__ == "__main__":
    if os.environ.get("_SCALING_CHILD") != "1":
        env = dict(os.environ)
        env["_SCALING_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
        raise SystemExit(subprocess.call(
            [sys.executable, os.path.abspath(__file__)], env=env))
    _child()
