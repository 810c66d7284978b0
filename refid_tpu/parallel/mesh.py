"""Device mesh + sharding helpers.

This replaces the reference's entire distributed stack — torch DDP wrap
(basicsr/models/base_model.py:57-75), launcher/rank plumbing
(basicsr/utils/dist_util.py), and the rank-sharded EnlargedSampler
(basicsr/data/data_sampler.py) — with a single ``jax.sharding.Mesh``:

  * axis ``data``    — batch dim (DP).  Gradient allreduce is inserted by
    XLA GSPMD; no NCCL, no DDP hooks.
  * axis ``spatial`` — image height (SP).  Convs over spatially-sharded
    inputs get halo exchanges from GSPMD automatically; this is the TPU
    answer for HighREV-resolution frames instead of the reference's
    ``grids`` host-side tiling.

Multi-host: call :func:`init_distributed` once per process, then meshes span
all hosts and data loading shards by ``jax.process_index()``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["init_distributed", "make_mesh", "batch_sharding",
           "replicate_sharding", "replicate", "shard_batch"]


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (no-op for single process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(data: int = -1, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ``(data, spatial)`` mesh.  ``data=-1`` -> all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % spatial == 0, (n, spatial)
        data = n // spatial
    assert data * spatial == n, (data, spatial, n)
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, ("data", "spatial"))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0,
                   spatial_axis: Optional[int] = None) -> NamedSharding:
    """Sharding that splits ``batch_axis`` over 'data' (and optionally a
    height axis over 'spatial')."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    if spatial_axis is not None and mesh.shape["spatial"] > 1:
        spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh; works on
    multi-process meshes (every process must hold identical values, e.g.
    params initialized from the same seed or loaded from the same file)."""
    sh = replicate_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.device_put(tree, sh)


def shard_batch(batch, mesh: Mesh, spatial_axes: Optional[dict] = None):
    """Device-put a pytree of host arrays with batch-dim sharding.

    ``spatial_axes``: optional map from leaf-ndim to the axis index holding
    image height (e.g. {4: 1, 5: 2} for NHWC / NTHWC tensors) to additionally
    shard over the 'spatial' mesh axis.
    """
    spatial_axes = spatial_axes or {}
    multiproc = jax.process_count() > 1

    def put(x):
        sh = batch_sharding(mesh, x.ndim, 0, spatial_axes.get(x.ndim))
        if multiproc:
            # each process holds only ITS slice of the global batch (the
            # sampler shards indices by process); assemble the global
            # jax.Array from per-process local data
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
