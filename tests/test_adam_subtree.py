"""Unit contract of the per-subtree Adam (parallel/train_step.py).

torch.optim.Adam keeps a per-param ``step`` that only advances when the
param receives a grad; under the reference's alternating freeze schedule
(ref: train.py:116-129 + requires_grad=False in fix_params,
e2v/e2v_model.py:116-133) a subnet coming out of a frozen phase restarts
its bias correction at t=1. These tests pin that contract directly (the
end-to-end evidence is tests/test_train_trajectory.py, slow tier).
"""
import numpy as np

import jax
import jax.numpy as jnp

from cista_flow_tpu.parallel import train_step as ts


def _params():
    return {"cista": {"w": jnp.ones((3,)) * 0.5},
            "flow": {"w": jnp.ones((3,)) * -0.2}}


def _grads(g_c, g_f):
    return {"cista": {"w": jnp.asarray(g_c, jnp.float32)},
            "flow": {"w": jnp.asarray(g_f, jnp.float32)}}


def _counts(state):
    # inject_hyperparams wraps the inner state
    inner = state.inner_state if hasattr(state, "inner_state") else state
    return jax.tree_util.tree_leaves(
        {k: v for k, v in inner.count.items()})


def test_first_step_matches_torch_bias_correction():
    lr = 1e-3
    opt = ts.make_optimizer(lr)
    params = _params()
    state = opt.init(params)
    g = _grads([1.0, -2.0, 0.5], [3.0, -0.1, 0.0])
    updates, state = opt.update(g, state, params)
    # t=1: mhat = g, vhat = g^2 -> update = -lr * g / (|g| + eps)
    for k in ("cista", "flow"):
        expect = -lr * np.asarray(g[k]["w"]) / (
            np.abs(np.asarray(g[k]["w"])) + 1e-8)
        np.testing.assert_allclose(np.asarray(updates[k]["w"]), expect,
                                   rtol=1e-6, atol=1e-12)


def test_frozen_subtree_count_and_moments_do_not_advance():
    opt = ts.make_optimizer(1e-3)
    params = _params()
    state = opt.init(params)

    # two live steps for both subtrees
    for i in range(2):
        updates, state = opt.update(
            _grads([1.0, 1.0, 1.0], [1.0, 1.0, 1.0]), state, params)

    # now emulate the train step's freeze of 'flow': compute the update,
    # then restore the frozen subtree's opt state (train_step.py
    # _select_frozen semantics)
    upd3, new_state = opt.update(
        _grads([1.0, 1.0, 1.0], [9.0, 9.0, 9.0]), state, params)
    frozen_state = ts._select_frozen("flow", new_state, state)

    def inner(s):
        return s.inner_state if hasattr(s, "inner_state") else s

    assert int(inner(frozen_state).count["cista"]) == 3
    assert int(inner(frozen_state).count["flow"]) == 2   # frozen: unchanged
    np.testing.assert_array_equal(
        np.asarray(inner(frozen_state).mu["flow"]["w"]),
        np.asarray(inner(state).mu["flow"]["w"]))

    # unfreeze: flow's next live update bias-corrects from ITS OWN count
    # (t=3), not the global step number
    upd4, state4 = opt.update(
        _grads([1.0, 1.0, 1.0], [1.0, 1.0, 1.0]), frozen_state, params)
    assert int(inner(state4).count["flow"]) == 3
    assert int(inner(state4).count["cista"]) == 4


def test_lr_injection_reaches_update():
    opt = ts.make_optimizer(1e-3)
    params = _params()
    state = opt.init(params)
    state = ts.set_lr(state, 5e-4)
    updates, _ = opt.update(_grads([1.0, 1.0, 1.0], [1.0, 1.0, 1.0]),
                            state, params)
    np.testing.assert_allclose(np.asarray(updates["cista"]["w"]),
                               -5e-4 * np.ones(3), rtol=1e-6)


def test_raft_optimizer_finite_at_tiny_horizons():
    """make_raft_optimizer must yield finite updates even for smoke-sized
    runs: optax.linear_onecycle_schedule emits NaN LR from step 0 when
    transition_steps is small enough that segment knots collide (seen at
    total_steps=2 and 10 with pct_start=0.05); the horizon clamp guards it."""
    import optax

    import pretrain_flow as pf

    for total in (1, 2, 10, 100, 1000):
        opt = pf.make_raft_optimizer(2e-4, total)
        params = {"w": jnp.ones(3)}
        state = opt.init(params)
        for _ in range(3):
            upd, state = opt.update({"w": jnp.array([0.1, -0.2, 0.3])},
                                    state, params)
            params = optax.apply_updates(params, upd)
        assert np.isfinite(np.asarray(params["w"])).all(), total
