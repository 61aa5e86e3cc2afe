"""Voxelization parity: host numpy vs reference, device jax vs host numpy."""
import numpy as np
import jax.numpy as jnp

from conftest import add_reference_to_path
from cista_flow_tpu import events as ev
from cista_flow_tpu import ops

RNG = np.random.default_rng(42)


def random_events(n, w, h):
    t = np.sort(RNG.random(n)).astype(np.float64)
    x = RNG.integers(0, w, n).astype(np.float64)
    y = RNG.integers(0, h, n).astype(np.float64)
    p = RNG.integers(0, 2, n).astype(np.float64)
    return np.stack([t, x, y, p], axis=1)


def test_host_voxel_matches_reference():
    add_reference_to_path()
    from utils.event_process import events_to_voxel_grid as ref_voxel

    e = random_events(5000, 64, 48)
    ref = ref_voxel(e.copy(), 5, 64, 48)
    got = ev.events_to_voxel_grid(e.copy(), 5, 64, 48)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_host_voxel_reverse_matches_reference():
    add_reference_to_path()
    from utils.event_process import events_to_voxel_grid as ref_voxel

    e = random_events(3000, 32, 24)
    ref = ref_voxel(e.copy(), 5, 32, 24, is_reverse=True)
    got = ev.events_to_voxel_grid(e.copy(), 5, 32, 24, is_reverse=True)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_device_voxel_matches_host():
    e = random_events(4000, 64, 48)
    host = ev.events_to_voxel_grid(e.copy(), 5, 64, 48)
    got = ops.events_to_voxel_grid(
        jnp.asarray(e[:, 0]), jnp.asarray(e[:, 1]), jnp.asarray(e[:, 2]),
        jnp.asarray(e[:, 3]), 5, 48, 64,
    )
    np.testing.assert_allclose(np.asarray(got), host, rtol=1e-4, atol=1e-4)


def test_device_voxel_padded_buffer():
    """Padded (masked) buffer must equal voxelizing only the valid prefix."""
    e = random_events(1000, 32, 24)
    host = ev.events_to_voxel_grid(e.copy(), 5, 32, 24)
    cap = 1500
    pad = np.zeros((cap - 1000, 4))
    pad[:, 0] = e[-1, 0]  # arbitrary in-range timestamps
    eb = np.concatenate([e, pad], axis=0)
    valid = np.arange(cap) < 1000
    got = ops.events_to_voxel_grid(
        jnp.asarray(eb[:, 0]), jnp.asarray(eb[:, 1]), jnp.asarray(eb[:, 2]),
        jnp.asarray(eb[:, 3]), 5, 24, 32, valid=jnp.asarray(valid),
    )
    np.testing.assert_allclose(np.asarray(got), host, rtol=1e-4, atol=1e-4)


def test_preprocess_std_matches_reference():
    add_reference_to_path()
    from utils.event_process import event_preprocess as ref_pre

    e = random_events(2000, 32, 24)
    v = ev.events_to_voxel_grid(e, 5, 32, 24)
    ref = ref_pre(v.copy(), mode="std", filter_hot_pixel=True)
    got_host = ev.event_preprocess(v.copy(), mode="std", filter_hot_pixel=True)
    np.testing.assert_allclose(got_host, ref, rtol=1e-5, atol=1e-6)
    got_dev = ops.event_preprocess(jnp.asarray(v), mode="std", filter_hot_pixel=True)
    np.testing.assert_allclose(np.asarray(got_dev), ref, rtol=1e-4, atol=1e-5)


def test_voxel_grid_pol_matches_reference():
    add_reference_to_path()
    from utils.event_process import events_to_voxel_grid_pol as ref_pol

    e = random_events(2000, 32, 24)
    ref = ref_pol(e.copy(), 5, 32, 24)
    got = ev.events_to_voxel_grid_pol(e.copy(), 5, 32, 24)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
