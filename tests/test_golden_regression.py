"""Golden regression: fixed-seed composite recurrence metrics pinned to
checked-in values (CPU f32). Catches silent numeric drift between rounds.

Regenerate (only after an INTENTIONAL numerics change, with parity tests
green): python tests/test_golden_regression.py --regen
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# full tier only: the composite recurrence compile is the fast tier's single
# heaviest item (~75 s); drift is equally caught by the nightly/full run
pytestmark = pytest.mark.slow

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_metrics.json")


def _run():
    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.losses import fwl_metric, recon_evaluate
    from cista_flow_tpu.models import composite

    cfg = Config(image_dim=(64, 96), model_mode="cista-eraft", flow_iters=2)
    params, mstate = composite.init(jax.random.PRNGKey(1234), cfg)
    rng = np.random.default_rng(1234)
    voxels = [rng.standard_normal((1, 64, 96, 5)).astype(np.float32)
              for _ in range(4)]
    gt = rng.random((1, 64, 96, 1)).astype(np.float32)

    state = composite.zero_state(1, cfg)
    rec = jnp.zeros((1, 64, 96, 1))
    out = {}
    for s in range(3):
        batch = {"event_voxel": jnp.asarray(voxels[s + 1]),
                 "event_voxel_old": jnp.asarray(voxels[s]),
                 "rec_img0": rec}
        rec, flow, state, mstate = composite.apply(params, mstate, batch,
                                                   state, cfg)
    m = recon_evaluate(rec, jnp.asarray(gt))
    out["mse"] = float(m["mse"])
    out["ssim"] = float(m["ssim"])
    out["fwl"] = float(fwl_metric(jnp.asarray(voxels[3]), flow["flow_final"]))
    out["rec_mean"] = float(jnp.mean(rec))
    out["flow_mean_abs"] = float(jnp.mean(jnp.abs(flow["flow_final"])))
    return out


def test_golden_metrics():
    got = _run()
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    for k, v in golden.items():
        np.testing.assert_allclose(got[k], v, rtol=2e-3, atol=1e-5,
                                   err_msg=k)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        with open(GOLDEN_PATH, "w") as f:
            json.dump(_run(), f, indent=2)
        print(f"wrote {GOLDEN_PATH}")
