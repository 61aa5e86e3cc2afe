"""step_window (device-resident lax.scan over an event window) must match T
sequential Reconstructor.step calls exactly — state, chaining extras, and
outputs — for every composite mode (the eval CLIs now dispatch whole windows;
ref loop being replaced: test_with_flow.py:120-156)."""
import numpy as np
import pytest

from cista_flow_tpu.configs import Config
from cista_flow_tpu.runner import Reconstructor

pytestmark = pytest.mark.slow  # full tier only: compile-heavy (see pytest.ini)

H, W = 32, 48
T = 3


def _voxels(rng, t, bins=5):
    return [rng.standard_normal((bins, H, W)).astype(np.float32)
            for _ in range(t)]


def _flows(rng, t):
    return [2.0 * rng.standard_normal((2, H, W)).astype(np.float32)
            for _ in range(t)]


@pytest.mark.parametrize("mode", ["cista-eiflow", "cista-eraft",
                                  "cista-idnet"])
def test_window_matches_sequential(mode):
    cfg = Config(image_dim=(H, W), model_mode=mode, flow_iters=2)
    rng = np.random.default_rng(0)
    voxels, flows = _voxels(rng, T), _flows(rng, T)

    r1 = Reconstructor(cfg)
    seq = [r1.step(v, f, use_gt_flow=False) for v, f in zip(voxels, flows)]

    r2 = Reconstructor(cfg)
    rec_w, flow_w = r2.step_window(voxels, flows, use_gt_flow=False)

    np.testing.assert_allclose(rec_w, seq[-1][0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(flow_w, seq[-1][1], rtol=1e-4, atol=1e-4)
    # carried state identical -> the NEXT step after the window agrees too
    v_next, f_next = _voxels(rng, 1)[0], _flows(rng, 1)[0]
    a = r1.step(v_next, f_next)
    b = r2.step(v_next, f_next)
    np.testing.assert_allclose(b[0], a[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b[1], a[1], rtol=1e-4, atol=1e-4)


def test_window_gt_flow_and_return_all():
    cfg = Config(image_dim=(H, W), model_mode="cista-gtflow")
    rng = np.random.default_rng(1)
    voxels, flows = _voxels(rng, T), _flows(rng, T)

    r1 = Reconstructor(cfg)
    seq = [r1.step(v, f, use_gt_flow=True) for v, f in zip(voxels, flows)]

    r2 = Reconstructor(cfg)
    recs, flws = r2.step_window(voxels, flows, use_gt_flow=True,
                                return_all=True)
    assert recs.shape == (T, H, W) and flws.shape == (T, 2, H, W)
    for t in range(T):
        np.testing.assert_allclose(recs[t], seq[t][0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(flws[t], seq[t][1], rtol=1e-5, atol=1e-5)
