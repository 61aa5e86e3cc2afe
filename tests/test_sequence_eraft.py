"""Time-parallel eraft serving == step-by-step composite recurrence."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from cista_flow_tpu.configs import Config
from cista_flow_tpu.models import composite

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)


def test_apply_sequence_eraft_matches_stepwise():
    cfg = Config(image_dim=(32, 48), model_mode="cista-eraft", flow_iters=1)
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    T, B = 3, 2
    voxel_seq = jnp.asarray(
        rng.standard_normal((T + 1, B, 32, 48, 5)).astype(np.float32))

    # step-by-step
    state = composite.zero_state(B, cfg)
    rec = jnp.zeros((B, 32, 48, 1))
    recs_ref, flows_ref = [], []
    for t in range(T):
        batch = {"event_voxel": voxel_seq[t + 1],
                 "event_voxel_old": voxel_seq[t],
                 "rec_img0": rec}
        rec, bf, state, _ = composite.apply(params, mstate, batch, state, cfg,
                                            collect_preds=False)
        recs_ref.append(np.asarray(rec))
        flows_ref.append(np.asarray(bf["flow_final"]))

    # time-parallel
    state0 = composite.zero_state(B, cfg)
    recs, flows, _ = composite.apply_sequence_eraft(
        params, mstate, voxel_seq, state0, cfg)

    for t in range(T):
        np.testing.assert_allclose(np.asarray(flows[t]), flows_ref[t],
                                   rtol=1e-4, atol=1e-5, err_msg=f"flow {t}")
        np.testing.assert_allclose(np.asarray(recs[t]), recs_ref[t],
                                   rtol=1e-4, atol=1e-5, err_msg=f"rec {t}")


def test_apply_sequence_eraft_tchunk_exact():
    """cfg.eraft_tchunk subchunked flow stage == single mega-batch call."""
    cfg = Config(image_dim=(32, 48), model_mode="cista-eraft", flow_iters=1)
    params, mstate = composite.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    T, B = 4, 2
    voxel_seq = jnp.asarray(
        rng.standard_normal((T + 1, B, 32, 48, 5)).astype(np.float32))

    state0 = composite.zero_state(B, cfg)
    recs_full, flows_full, _ = composite.apply_sequence_eraft(
        params, mstate, voxel_seq, state0, cfg)

    cfg_c = Config(image_dim=(32, 48), model_mode="cista-eraft",
                   flow_iters=1, eraft_tchunk=2)
    state0 = composite.zero_state(B, cfg_c)
    recs_c, flows_c, _ = composite.apply_sequence_eraft(
        params, mstate, voxel_seq, state0, cfg_c)

    np.testing.assert_allclose(np.asarray(flows_c), np.asarray(flows_full),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(recs_c), np.asarray(recs_full),
                               rtol=1e-5, atol=1e-6)
