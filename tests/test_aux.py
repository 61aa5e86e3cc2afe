"""Aux subsystems: orbax checkpoint round-trip, step timer, trace smoke."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cista_flow_tpu.ckpt import orbax_io
from cista_flow_tpu.utils import profiling


def test_orbax_roundtrip(tmp_path):
    from cista_flow_tpu import parallel
    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.models import composite

    cfg = Config(image_dim=(32, 48), model_mode="cista-idnet")
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    opt = parallel.make_optimizer(1e-4)
    opt_state = opt.init(params)

    d = str(tmp_path / "ckpt")
    orbax_io.save_checkpoint(d, 7, params, mstate, opt_state)
    assert orbax_io.latest_step(d) == 7

    template = {"params": params, "model_state": mstate,
                "opt_state": opt_state}
    restored, step = orbax_io.restore_checkpoint(d, template=template)
    assert step == 7
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state round-trips too (exact resume, unlike the reference)
    c1 = jax.tree_util.tree_leaves(opt_state)
    c2 = jax.tree_util.tree_leaves(restored["opt_state"])
    assert len(c1) == len(c2)


def test_step_timer():
    t = profiling.StepTimer("unit", warmup=1)
    x = jnp.ones((128, 128))
    for _ in range(4):
        t.start()
        y = x @ x
        t.stop(y)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_ms"] > 0
    assert "unit" in str(t)


def test_trace_smoke(tmp_path):
    d = str(tmp_path / "tb")
    with profiling.trace(d):
        with profiling.annotate("matmul"):
            y = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            jax.block_until_ready(y)
    # trace files written
    found = [f for _, _, files in os.walk(d) for f in files]
    assert found


def test_trace_tools(tmp_path):
    from cista_flow_tpu.utils import trace_tools

    d = str(tmp_path / "tb")
    with profiling.trace(d):
        y = jnp.ones((256, 256)) @ jnp.ones((256, 256))
        jax.block_until_ready(y)
    rows = trace_tools.summarize(d, runs=1, top=10)
    assert isinstance(rows, list)
    trace_tools.print_summary(d)
