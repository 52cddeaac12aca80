"""Device meshes and sharding policies (data / spatial axes over ICI)."""

from singlehdr_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    initialize_multihost,
    replicate,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "batch_sharding",
    "make_mesh",
    "initialize_multihost",
    "replicate",
    "shard_batch",
]
