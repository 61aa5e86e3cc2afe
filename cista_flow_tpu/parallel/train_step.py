"""Sharded training step: BPTT over the sequence unroll, data-parallel grads.

Mirrors the reference's training semantics (ref: train.py:180-232):
* per sequence: state reset, rec_img0 = zeros at s=0 then the previous
  output WITHOUT detach (gradient flows through the whole unroll)
* loss accumulated across the unroll, one optimizer step per sequence
* temporal-consistency term enabled from s >= 2
* phase schedule freezes one subnet: frozen params get exactly-zero grads
  (stop_gradient inside the composite) AND their Adam moments are kept
  untouched (torch's requires_grad=False semantics).

The whole unroll is a single ``lax.scan`` under ``jit`` over a Mesh: batch
sharded on the 'data' axis, params replicated — XLA inserts the gradient
all-reduce over ICI.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import composite
from ..losses.recon import flow_recon_loss
from .mesh import batch_sharding, replicated


class _AdamState(NamedTuple):
    count: dict  # per-top-level-subtree step counts ({'cista': t, 'flow': t})
    mu: dict
    nu: dict


def _adam_per_subtree(learning_rate, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam semantics with PER-SUBTREE step counts.

    torch keeps a per-param ``step`` that only advances when the param has a
    grad; under the alternating freeze schedule (ref: train.py:116-129 +
    requires_grad=False in fix_params, e2v/e2v_model.py:116-133) a subnet
    coming out of a frozen phase therefore restarts its bias correction at
    t=1. A global optax count would instead resume at t=N (large), shrinking
    the fresh-moment bias correction by ~(1-b1) / sqrt(1-b2) ≈ 3.2x at the
    phase boundary. Counts here live per top-level key so the train step's
    frozen-subtree state restore (``_select_frozen``) freezes them too —
    matching torch's trajectory exactly (pinned by
    tests/test_train_trajectory.py).
    """

    def init_fn(params):
        zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)  # noqa: E731
        return _AdamState(count={k: jnp.zeros([], jnp.int32) for k in params},
                          mu=zeros(params), nu=zeros(params))

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(lambda g, m: b1 * m + (1 - b1) * g,
                                    updates, state.mu)
        nu = jax.tree_util.tree_map(lambda g, v: b2 * v + (1 - b2) * g * g,
                                    updates, state.nu)
        count = {k: state.count[k] + 1 for k in updates}
        out = {}
        for k in updates:
            t = count[k].astype(jnp.float32)
            bc1, bc2 = 1.0 - b1 ** t, 1.0 - b2 ** t
            out[k] = jax.tree_util.tree_map(
                lambda m, v: -learning_rate * (m / bc1)
                / (jnp.sqrt(v / bc2) + eps), mu[k], nu[k])
        return out, _AdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with injectable lr (reference: Adam + StepLR(10, 0.9) + the
    phase-3 hard override to 3e-5 — ref: train.py:92-95,123)."""
    return optax.inject_hyperparams(_adam_per_subtree)(learning_rate=lr)


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def step_lr(base_lr: float, epoch: int, step_size: int = 10,
            gamma: float = 0.9) -> float:
    return base_lr * (gamma ** (epoch // step_size))


def _select_frozen(frozen_key: str, new_tree, old_tree):
    """Take ``old_tree``'s leaves wherever the path crosses ``frozen_key``."""
    def fn(path, new_leaf, old_leaf):
        for p in path:
            if isinstance(p, jax.tree_util.DictKey) and p.key == frozen_key:
                return old_leaf
        return new_leaf

    return jax.tree_util.tree_map_with_path(fn, new_tree, old_tree)


def make_train_step(cfg, optimizer, loss_mode: str, fix_net_name: str | None,
                    use_gt_flow: bool, lpips_params=None, mesh=None,
                    donate: bool = True, spatial_axis: str | None = None,
                    remat: bool = False) -> Callable:
    """Build the jitted train step for one phase.

    seq batch: dict of (T, B, ...) NHWC arrays with keys
      event_voxel, gt_img0, gt_img1, gt_flow
      [+ event_voxel_old (eraft) | event_voxel_bw (eiflow bi)].
    Returns step(params, model_state, opt_state, seq) ->
      (params, model_state, opt_state, loss).

    ``spatial_axis``: optional second mesh axis name for activation
    (spatial/tensor) parallelism — the per-step NHWC activations are
    constrained to shard H over this axis; XLA GSPMD inserts the halo
    exchanges for the convolutions. This is the conv-net analogue of TP and
    the idiomatic upgrade of the reference's 2-GPU model split
    (ref: e2v/e2v_model.py:312-346).
    """
    from jax.sharding import PartitionSpec as P

    frozen_key = {"rec": "cista", "flow": "flow"}.get(fix_net_name)
    # mixed precision: f32 master params, bf16 forward/backward compute
    # (losses and flows stay f32; grads come back f32 through the cast)
    bf16 = getattr(cfg, "dtype", "float32") == "bfloat16"

    def constrain(step_data):
        if mesh is None or spatial_axis is None:
            return step_data
        spec = P("data", spatial_axis, None, None)  # (B, H, W, C)
        return {k: jax.lax.with_sharding_constraint(
            v, jax.sharding.NamedSharding(mesh, spec))
            for k, v in step_data.items()}

    def loss_fn(params, model_state, seq):
        if bf16:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            seq = dict(seq)
            for k in ("event_voxel", "event_voxel_old", "event_voxel_bw"):
                if k in seq:
                    seq[k] = seq[k].astype(jnp.bfloat16)
        t_len, batch = seq["event_voxel"].shape[:2]
        h, w = cfg.image_dim
        state0 = composite.zero_state(batch, cfg)
        if bf16:
            state0 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), state0)
        rec0 = jnp.zeros((batch, h, w, 1), seq["event_voxel"].dtype)

        # ref: train.py:210-217 — the consistency term exists only on the
        # train-rec alternation (loss_mode 'rec'), from s >= 2; the 'both'
        # mode (phase-3 train-flow half) runs with is_loss_consis=False.
        if loss_mode == "rec":
            consis_flags = jnp.arange(t_len) >= 2
        else:
            consis_flags = jnp.zeros(t_len, bool)

        def body(carry, xs):
            state, rec_prev, mstate = carry
            step_data, is_consis = xs
            step_data = constrain(step_data)
            batch_data = {"event_voxel": step_data["event_voxel"],
                          "rec_img0": rec_prev}
            for k in ("event_voxel_old", "event_voxel_bw"):
                if k in step_data:
                    batch_data[k] = step_data[k]
            batch_gt = {"gt_img1": step_data["gt_img1"]}
            if use_gt_flow:
                batch_gt["gt_flow"] = step_data["gt_flow"]

            rec, batch_flow, state, mstate = composite.apply(
                params, mstate, batch_data, state, cfg, batch_gt=batch_gt,
                fix_net_name=fix_net_name, train=True)

            target = {"gt_img0": step_data["gt_img0"],
                      "gt_img1": step_data["gt_img1"],
                      "gt_flow": step_data["gt_flow"]}
            if "gt_flow_bw" in step_data:  # bilateral training (is_bi)
                target["gt_flow_bw"] = step_data["gt_flow_bw"]
            loss = flow_recon_loss(
                rec, rec_prev, batch_flow, target, cfg, loss_mode,
                lpips_params=lpips_params, is_loss_consis=is_consis)
            return (state, rec, mstate), loss

        # remat: recompute the unroll step's activations in the backward
        # pass instead of keeping all T steps' intermediates live — trades
        # ~1/3 more FLOPs for O(T) less live memory, lifting the tunnel's
        # large-batch BPTT compile ceiling (PERF.md "Training")
        scan_body = jax.checkpoint(body) if remat else body
        (state, rec, mstate), losses = jax.lax.scan(
            scan_body, (state0, rec0, model_state), (seq, consis_flags))
        return jnp.sum(losses), mstate

    def step(params, model_state, opt_state, seq):
        (loss, new_mstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, model_state, seq)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        if frozen_key is not None:
            # frozen subtree: zero update, preserve its Adam moments AND its
            # per-subtree step count (torch's requires_grad=False semantics —
            # see _adam_per_subtree)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, updates)
            updates = _select_frozen(frozen_key, updates, zeros)
            new_opt_state = _select_frozen(frozen_key, new_opt_state, opt_state)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_mstate, new_opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())

    rep = replicated(mesh)
    if spatial_axis is not None:
        bsh = jax.sharding.NamedSharding(mesh, P(None, "data", spatial_axis))
    else:
        bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, bsh),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1, 2) if donate else (),
    )
