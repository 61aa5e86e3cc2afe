"""Device mesh + sharding helpers.

The reference's only multi-device mode is a hand-rolled 2-GPU model split
with per-step tensor hops (ref: e2v/e2v_model.py:312-346). The TPU-native
equivalent is a ``jax.sharding.Mesh``: data-parallel batch sharding over ICI
with XLA-inserted all-reduces for gradients (and room for a model axis).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axes=("data",), devices=None) -> Mesh:
    """Build a mesh. shape=None uses all devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    shape = tuple(int(s) for s in shape)
    n = int(np.prod(shape))
    return Mesh(np.asarray(devices[:n]).reshape(shape), tuple(axes))


def mesh_from_config(cfg, devices=None) -> Mesh:
    shape = tuple(int(s) for s in str(cfg.mesh_shape).split(","))
    axes = tuple(str(a) for a in str(cfg.mesh_axes).split(","))
    return make_mesh(shape, axes, devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis_index: int = 1,
                   axis: str = "data") -> NamedSharding:
    """Sharding for (T, B, ...) sequence tensors: shard B over ``axis``."""
    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = axis
    return NamedSharding(mesh, P(*spec))


def shard_seq_batch(batch: dict, mesh: Mesh, axis: str = "data",
                    spatial_axis: str | None = None) -> dict:
    """Device-put a dict of (T, B, H, W, C) host arrays with B sharded over
    ``axis`` (and H over ``spatial_axis`` if given).

    Multi-host: each process passes its *local* batch (the global batch's
    contiguous slice along B for this process); the pieces are assembled into
    one global jax.Array without any cross-host copy
    (``jax.make_array_from_process_local_data``). Single-process it reduces to
    a plain sharded device_put.
    """
    if spatial_axis is not None:
        sh = NamedSharding(mesh, P(None, axis, spatial_axis))
    else:
        sh = batch_sharding(mesh, 1, axis)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
