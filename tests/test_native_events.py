"""Native C++ ingestion kernels: bit-exactness vs numpy + throughput sanity."""
import time

import numpy as np
import pytest

from cista_flow_tpu.events import (
    event_preprocess_numpy,
    events_to_voxel_grid_numpy,
)
from cista_flow_tpu.events import native

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def random_events(n, w, h):
    t = np.sort(RNG.random(n))
    x = RNG.integers(0, w, n).astype(np.float64)
    y = RNG.integers(0, h, n).astype(np.float64)
    p = RNG.integers(0, 2, n).astype(np.float64)
    return np.stack([t, x, y, p], axis=1)


@pytest.mark.parametrize("is_reverse", [False, True])
def test_native_voxelize_bit_exact(lib, is_reverse):
    e = random_events(20000, 240, 180)
    ref = events_to_voxel_grid_numpy(e.copy(), 5, 240, 180, is_reverse)
    got = native.voxelize_events(e, 5, 240, 180, is_reverse)
    np.testing.assert_array_equal(got, ref)


def test_native_preprocess_matches_numpy(lib):
    # numpy uses pairwise f32 summation for the statistics; the native kernel
    # accumulates in f64 — equal to ~1 ULP of the statistics, not bit-equal.
    e = random_events(15000, 240, 180)
    v = events_to_voxel_grid_numpy(e, 5, 240, 180)
    ref = event_preprocess_numpy(v.copy(), "std", filter_hot_pixel=True)
    got = v.copy()
    assert native.preprocess_std(got, filter_hot_pixel=True)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_native_triangular_matches_numpy(lib):
    from cista_flow_tpu.data.mvsec_utils import events_to_voxel_triangular

    n = 5000
    t = np.sort(RNG.random(n))
    x = RNG.integers(0, 346, n).astype(np.float64)
    y = RNG.integers(0, 260, n).astype(np.float64)
    p = RNG.choice([-1.0, 1.0], n)
    exytp = np.stack([x, y, t, p], axis=1)
    ref = events_to_voxel_triangular(exytp, 5, 260, 346)
    got = native.voxelize_triangular(exytp, 5, 260, 346)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_native_is_faster(lib):
    e = random_events(200000, 240, 180)
    t0 = time.perf_counter()
    for _ in range(3):
        events_to_voxel_grid_numpy(e, 5, 240, 180)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        native.voxelize_events(e, 5, 240, 180)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_np, (t_cc, t_np)
    print(f"native speedup: {t_np / t_cc:.1f}x")
