"""Half-domain flow serving (cfg.flow_half) — structural pins.

The eiflow flow net runs on the 2x-downsampled domain (composite.apply);
its half-domain final flow is consumed directly as the state-warp flow and
x2-upsampled (x2 magnitudes, flow-resize convention ref:
e2v/e2v_model.py:190) for the frame warp. A serving-time reduction knob:
admission is by the quality gate (frontier.py / PERF.md round 5), exactly
like reduced GRU iterations and reduced ISTA depth.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cista_flow_tpu import configs
from cista_flow_tpu.models import composite


@pytest.fixture(scope="module")
def setup():
    cfg = configs.Config(model_mode="cista-eiflow", image_dim=(64, 96),
                         flow_half=True, dtype="float32")
    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "event_voxel": jnp.asarray(
            rng.standard_normal((2, 64, 96, 5)), jnp.float32),
        "rec_img0": jnp.asarray(
            rng.uniform(0, 1, (2, 64, 96, 1)), jnp.float32),
    }
    state = composite.zero_state(2, cfg)
    return cfg, params, mstate, batch, state


def test_flow_half_shapes_and_domain(setup):
    cfg, params, mstate, batch, state = setup
    rec, bf, new_state, _ = composite.apply(params, mstate, batch, state, cfg)
    assert rec.shape == (2, 64, 96, 1)
    # full-resolution flow out (what EPE metrics consume)
    assert bf["flow_final"].shape == (2, 64, 96, 2)
    # the net genuinely ran on the half domain: 1/8-res flow of the padded
    # 32x48 -> 32x64 half frame
    assert bf["flow_init"].shape == (2, 4, 8, 2)
    assert bool(jnp.isfinite(rec).all())
    assert bool(jnp.isfinite(bf["flow_final"]).all())
    # recurrent state advanced with the half-domain warp flow
    assert new_state.sparse_code.shape == state.sparse_code.shape


def test_flow_half_upsample_convention(setup):
    """flow_final must be exactly 2 * x2-up(align_corners=True) of the
    half-domain flow — the reference's flow-resize magnitude rule."""
    from cista_flow_tpu.ops.resize import interpolate_scale
    from cista_flow_tpu.models import dceiflow
    import dataclasses

    cfg, params, mstate, batch, state = setup
    _, bf, _, _ = composite.apply(params, mstate, batch, state, cfg)

    hcfg = dataclasses.replace(cfg, image_dim=(32, 48))
    ev_h = interpolate_scale(batch["event_voxel"], 0.5, align_corners=False)
    im_h = interpolate_scale(batch["rec_img0"], 0.5, align_corners=False)
    out_h, _ = dceiflow.apply(params["flow"], mstate["flow"], ev_h, im_h,
                              hcfg, iters=cfg.default_flow_iters())
    want = 2.0 * interpolate_scale(out_h["flow_final"], 2.0,
                                   align_corners=True)
    np.testing.assert_allclose(np.asarray(bf["flow_final"]),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_flow_half_off_is_untouched(setup):
    cfg, params, mstate, batch, state = setup
    full_cfg = configs.Config(model_mode="cista-eiflow", image_dim=(64, 96),
                              flow_half=False, dtype="float32")
    rec, bf, _, _ = composite.apply(params, mstate, batch, state, full_cfg)
    assert bf["flow_init"].shape == (2, 8, 12, 2)  # full-domain 1/8 res
    #                        (64x96 is already 32-aligned: no pad, /8)
    assert rec.shape == (2, 64, 96, 1)


def test_flow_half_cli_knob():
    import argparse
    p = argparse.ArgumentParser()
    configs.add_args(p)
    cfg = configs.from_args(p.parse_args(["--flow_half"]))
    assert cfg.flow_half is True
    cfg = configs.from_args(p.parse_args([]))
    assert cfg.flow_half is False
