"""Sharding rules for batches, params, and spatially sharded images."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uegan_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: shard N over 'data' (and H over 'spatial' if sized > 1)."""
    if mesh.shape.get(SPATIAL_AXIS, 1) > 1:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """High-res inference: shard H over every mesh device (data*spatial).

    A single 2048px image is split row-wise across the slice; GSPMD inserts
    halo exchanges for the conv receptive fields and psums for GAM stats —
    the TPU-native replacement for manual tile/stitch (BASELINE config #5).
    """
    if mesh.shape.get(SPATIAL_AXIS, 1) > 1 and mesh.shape.get(DATA_AXIS, 1) > 1:
        return NamedSharding(mesh, P(None, (DATA_AXIS, SPATIAL_AXIS), None, None))
    axis = SPATIAL_AXIS if mesh.shape.get(SPATIAL_AXIS, 1) > 1 else DATA_AXIS
    return NamedSharding(mesh, P(None, axis, None, None))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put the numpy batch onto the mesh with batch sharding."""
    sh = batch_sharding(mesh)
    out = dict(batch)
    for k in ("img_exp", "img_raw"):
        if k in batch:
            out[k] = jax.device_put(batch[k], sh)
    return out
