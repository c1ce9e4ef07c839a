"""Sharding helpers: frame batches over the inspection mesh."""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for [N, H, W, C] frame batches: N over "data", optionally
    H over "spatial"."""
    if spatial:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, frames, spatial: bool = False):
    """Place a host frame batch onto the mesh (the H2D boundary).

    This is the TPU-native replacement for the reference's FrameSet fan-in
    (rust/heimdall-gige/src/frame.rs:125-179): cameras' frames assemble
    host-side into one [N, H, W, C] block, then a single device_put shards
    rows over ICI.
    """
    return jax.device_put(frames, batch_sharding(mesh, spatial))
