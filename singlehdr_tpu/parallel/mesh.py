"""Device meshes and sharding for scale-out training and inference.

The reference trains on one pinned GPU with no distribution at all
(train.py:342-349; SURVEY.md §2 row 23).  The TPU-native equivalents here:

  * **data parallelism** — batch dim sharded over the ``data`` mesh axis;
    parameters replicated; XLA inserts the gradient all-reduce (psum over ICI)
    automatically because the jitted loss reduces over a sharded batch while
    gradients target replicated params.
  * **spatial parallelism** — the conv analog of sequence/context parallelism
    (SURVEY.md §5): image rows sharded over the ``spatial`` axis; XLA SPMD
    inserts halo exchanges for the conv stencils.  This scales single large
    images (inference) beyond one chip's HBM.
  * **multi-host** — ``initialize_multihost`` wraps jax.distributed.initialize
    so meshes span hosts over DCN while collectives ride ICI within a slice.

No NCCL/MPI layer exists or is needed; collectives come from XLA.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def _pick_devices(n_devices: Optional[int]) -> list:
    """Default to all addressable devices; fall back to virtual CPU devices
    when more are requested than the default backend exposes (dry runs)."""
    devices = jax.devices()
    if n_devices is None:
        return devices
    if len(devices) < n_devices:
        cpu = jax.devices("cpu")
        if len(cpu) >= n_devices:
            return cpu[:n_devices]
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)} "
            f"({len(cpu)} cpu)"
        )
    return devices[:n_devices]


def make_mesh(
    n_devices: Optional[int] = None,
    spatial: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over n devices (spatial defaults to 1,
    i.e. pure data parallelism)."""
    devs = list(devices) if devices is not None else _pick_devices(n_devices)
    n = len(devs)
    if n % spatial:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    grid = np.asarray(devs).reshape(n // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = 1) -> NamedSharding:
    """NHWC batch sharding: dim 0 over 'data', dim `spatial_dim` over 'spatial'."""
    spec = [None, None, None, None]
    spec[0] = DATA_AXIS
    if spatial_dim is not None and mesh.shape[SPATIAL_AXIS] > 1:
        spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def per_sample_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [b,1,1,1]-style per-sample tensors (masks, exposures)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params, states) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch: Any, spatial_dim: Optional[int] = 1) -> Any:
    """Move host arrays to the mesh with batch-dim (and optional H) sharding.

    Rank-4 leaves get (data, spatial) sharding; rank>=1 leaves get data-only
    sharding on dim 0; scalars replicate.
    """
    full = batch_sharding(mesh, spatial_dim)
    data_only = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    n_spatial = mesh.shape[SPATIAL_AXIS]

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if (
            x.ndim == 4
            and spatial_dim is not None
            and x.shape[spatial_dim] % n_spatial == 0
            and x.shape[spatial_dim] > 1
        ):
            return jax.device_put(x, full)
        if x.ndim >= 1:
            return jax.device_put(x, data_only)
        return jax.device_put(x, rep)

    return jax.tree.map(put, batch)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host run (DCN coordination; no-op for single host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
