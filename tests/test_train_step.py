"""Training-step tests: loss decreases, freezing semantics, 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cista_flow_tpu import parallel
from cista_flow_tpu.configs import Config
from cista_flow_tpu.models import composite

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)


def make_seq(rng, t_len, batch, h, w, bins, with_old=False):
    seq = {
        "event_voxel": rng.standard_normal((t_len, batch, h, w, bins)).astype(np.float32),
        "gt_img0": rng.random((t_len, batch, h, w, 1)).astype(np.float32),
        "gt_img1": rng.random((t_len, batch, h, w, 1)).astype(np.float32),
        "gt_flow": (rng.standard_normal((t_len, batch, h, w, 2)) * 2).astype(np.float32),
    }
    if with_old:
        seq["event_voxel_old"] = rng.standard_normal(
            (t_len, batch, h, w, bins)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in seq.items()}


@pytest.fixture(scope="module")
def cfg():
    return Config(image_dim=(32, 48), model_mode="cista-eraft",
                  len_sequence=2, flow_iters=1)


def test_train_step_runs_and_freezes(cfg):
    rng = np.random.default_rng(0)
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    opt = parallel.make_optimizer(1e-4)
    opt_state = opt.init(params)
    seq = make_seq(rng, 2, 2, 32, 48, 5, with_old=True)

    # phase 1: train flow, freeze rec (GT flow drives CISTA)
    step = parallel.make_train_step(cfg, opt, loss_mode="flow",
                                    fix_net_name="rec", use_gt_flow=True,
                                    donate=False)
    new_params, _, new_opt, loss = step(params, mstate, opt_state, seq)
    assert np.isfinite(float(loss))

    # cista params untouched, flow params moved
    cista_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), params["cista"], new_params["cista"]))
    assert cista_same
    flow_changed = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), params["flow"], new_params["flow"]))
    assert flow_changed


def test_train_step_rec_phase_decreases_loss(cfg):
    rng = np.random.default_rng(1)
    params, mstate = composite.init(jax.random.PRNGKey(1), cfg)
    opt = parallel.make_optimizer(1e-3)
    opt_state = opt.init(params)
    seq = make_seq(rng, 2, 1, 32, 48, 5, with_old=True)

    step = parallel.make_train_step(cfg, opt, loss_mode="rec",
                                    fix_net_name="flow", use_gt_flow=False)
    losses = []
    for _ in range(3):
        params, mstate, opt_state, loss = step(params, mstate, opt_state, seq)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_train_step_on_8_device_mesh(cfg):
    """Full DP sharding on the virtual 8-CPU mesh."""
    rng = np.random.default_rng(2)
    mesh = parallel.make_mesh((8,), ("data",))
    params, mstate = composite.init(jax.random.PRNGKey(2), cfg)
    params = parallel.replicate_tree(params, mesh)
    mstate = parallel.replicate_tree(mstate, mesh)
    opt = parallel.make_optimizer(1e-4)
    opt_state = parallel.replicate_tree(opt.init(params), mesh)

    seq = make_seq(rng, 2, 8, 32, 48, 5, with_old=True)
    seq = parallel.shard_seq_batch(seq, mesh)

    step = parallel.make_train_step(cfg, opt, loss_mode="both",
                                    fix_net_name=None, use_gt_flow=False,
                                    mesh=mesh, donate=False)
    new_params, _, _, loss = step(params, mstate, opt_state, seq)
    assert np.isfinite(float(loss))

    # grads must be identical across the mesh (all-reduced): check one leaf's
    # sharding is fully replicated
    leaf = new_params["cista"]["We"]["w"]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_dp_matches_single_device(cfg):
    """DP over 8 devices == single-device step on the same global batch."""
    rng = np.random.default_rng(3)
    params, mstate = composite.init(jax.random.PRNGKey(3), cfg)
    opt = parallel.make_optimizer(1e-4)
    opt_state = opt.init(params)
    seq = make_seq(rng, 2, 8, 32, 48, 5, with_old=True)

    step1 = parallel.make_train_step(cfg, opt, "rec", None, False, donate=False)
    p1, _, _, loss1 = step1(params, mstate, opt_state, seq)

    mesh = parallel.make_mesh((8,), ("data",))
    stepN = parallel.make_train_step(cfg, opt, "rec", None, False, mesh=mesh,
                                     donate=False)
    pN, _, _, lossN = stepN(
        parallel.replicate_tree(params, mesh),
        parallel.replicate_tree(mstate, mesh),
        parallel.replicate_tree(opt_state, mesh),
        parallel.shard_seq_batch(seq, mesh))

    np.testing.assert_allclose(float(loss1), float(lossN), rtol=1e-4)
    a = np.asarray(p1["cista"]["final"]["w"])
    b = np.asarray(pN["cista"]["final"]["w"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_train_step_dp_plus_spatial_mesh(cfg):
    """2D mesh: batch on 'data', activation H on 'spatial' (GSPMD halo
    exchanges for the convolutions)."""
    rng = np.random.default_rng(4)
    mesh = parallel.make_mesh((2, 4), ("data", "spatial"))
    params, mstate = composite.init(jax.random.PRNGKey(4), cfg)
    params = parallel.replicate_tree(params, mesh)
    mstate = parallel.replicate_tree(mstate, mesh)
    opt = parallel.make_optimizer(1e-4)
    opt_state = parallel.replicate_tree(opt.init(params), mesh)

    seq = make_seq(rng, 2, 2, 32, 48, 5, with_old=True)
    step = parallel.make_train_step(cfg, opt, loss_mode="rec",
                                    fix_net_name=None, use_gt_flow=False,
                                    mesh=mesh, donate=False,
                                    spatial_axis="spatial")
    new_params, _, _, loss = step(params, mstate, opt_state, seq)
    assert np.isfinite(float(loss))

    # must equal the unsharded computation
    step1 = parallel.make_train_step(cfg, opt, "rec", None, False, donate=False)
    p1, _, _, loss1 = step1(*[jax.device_get(x) for x in
                              (params, mstate, opt_state)], seq)
    np.testing.assert_allclose(float(loss), float(loss1), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_params["cista"]["final"]["w"]),
        np.asarray(p1["cista"]["final"]["w"]), rtol=1e-4, atol=1e-6)


def test_bf16_train_step_runs_and_converges():
    """Mixed-precision training: f32 master params, bf16 compute."""
    rng = np.random.default_rng(5)
    bcfg = Config(image_dim=(32, 48), model_mode="cista-eraft",
                  len_sequence=2, flow_iters=1, dtype="bfloat16")
    params, mstate = composite.init(jax.random.PRNGKey(5), bcfg)
    opt = parallel.make_optimizer(1e-3)
    opt_state = opt.init(params)
    seq = make_seq(rng, 2, 1, 32, 48, 5, with_old=True)

    step = parallel.make_train_step(bcfg, opt, loss_mode="rec",
                                    fix_net_name=None, use_gt_flow=False,
                                    donate=False)
    losses = []
    for _ in range(3):
        params, mstate, opt_state, loss = step(params, mstate, opt_state, seq)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # master params stayed f32
    assert params["cista"]["We"]["w"].dtype == jnp.float32


@pytest.mark.parametrize("loss_mode,fix", [("rec", "flow"), ("both", None)])
def test_idnet_training_step(loss_mode, fix):
    """cista-idnet through every phase's loss (its flow_preds is a Python
    list, a different code path than the stacked-array flow nets)."""
    rng = np.random.default_rng(8)
    icfg = Config(image_dim=(32, 48), model_mode="cista-idnet",
                  len_sequence=2, flow_iters=1)
    params, mstate = composite.init(jax.random.PRNGKey(8), icfg)
    opt = parallel.make_optimizer(1e-4)
    opt_state = opt.init(params)
    seq = make_seq(rng, 2, 1, 32, 48, 5)
    step = parallel.make_train_step(icfg, opt, loss_mode=loss_mode,
                                    fix_net_name=fix, use_gt_flow=False,
                                    donate=False)
    _, _, _, loss = step(params, mstate, opt_state, seq)
    assert np.isfinite(float(loss))


def test_bilateral_training_step():
    """is_bi + reversed events: bidirectional flow loss path end-to-end."""
    rng = np.random.default_rng(6)
    bcfg = Config(image_dim=(32, 48), model_mode="cista-eiflow",
                  len_sequence=2, flow_iters=1, is_bi=True,
                  is_reverse_events=True)
    params, mstate = composite.init(jax.random.PRNGKey(6), bcfg)
    opt = parallel.make_optimizer(1e-4)
    opt_state = opt.init(params)
    seq = make_seq(rng, 2, 1, 32, 48, 5)
    seq["event_voxel_bw"] = jnp.asarray(
        rng.standard_normal((2, 1, 32, 48, 5)).astype(np.float32))
    seq["gt_flow_bw"] = jnp.asarray(
        (rng.standard_normal((2, 1, 32, 48, 2)) * 2).astype(np.float32))

    step = parallel.make_train_step(bcfg, opt, loss_mode="flow",
                                    fix_net_name="rec", use_gt_flow=True,
                                    donate=False)
    _, _, _, loss = step(params, mstate, opt_state, seq)
    assert np.isfinite(float(loss))


def test_remat_matches_no_remat(cfg):
    """jax.checkpoint over the BPTT body must not change the step's math."""
    rng = np.random.default_rng(7)
    params, mstate = composite.init(jax.random.PRNGKey(7), cfg)
    opt = parallel.make_optimizer(1e-4)
    opt_state = opt.init(params)
    seq = make_seq(rng, 3, 2, 32, 48, 5, with_old=True)

    kw = dict(loss_mode="rec", fix_net_name="flow", use_gt_flow=False,
              donate=False)
    step_a = parallel.make_train_step(cfg, opt, **kw)
    step_b = parallel.make_train_step(cfg, opt, remat=True, **kw)
    pa, _, _, la = step_a(params, mstate, opt_state, seq)
    pb, _, _, lb = step_b(params, mstate, opt_state, seq)
    assert float(la) == pytest.approx(float(lb), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_train_step_with_lpips_in_graph(cfg):
    """The perceptual term compiles into the BPTT train step and changes
    the loss and the gradients (random LPIPS weights — the committed
    conversion pipeline supplies real ones; ref: loss.py:340 includes the
    LPIPS term in ReconLoss)."""
    from cista_flow_tpu.losses import lpips as lpips_mod

    rng = np.random.default_rng(3)
    params, mstate = composite.init(jax.random.PRNGKey(3), cfg)
    opt = parallel.make_optimizer(1e-4)
    opt_state = opt.init(params)
    seq = make_seq(rng, 2, 2, 32, 48, 5, with_old=True)

    lp = lpips_mod.init(jax.random.PRNGKey(7), net="alex")
    kw = dict(loss_mode="rec", fix_net_name="flow", use_gt_flow=False,
              donate=False)
    step_plain = parallel.make_train_step(cfg, opt, **kw)
    step_lpips = parallel.make_train_step(cfg, opt, lpips_params=lp, **kw)

    p0, _, o0, loss_plain = step_plain(params, mstate, opt_state, seq)
    p1, _, o1, loss_lpips = step_lpips(params, mstate, opt_state, seq)
    assert np.isfinite(float(loss_lpips))
    # the perceptual term contributes: loss and updated params both differ
    assert abs(float(loss_lpips) - float(loss_plain)) > 1e-6
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), p0["cista"], p1["cista"]))
    assert not same
