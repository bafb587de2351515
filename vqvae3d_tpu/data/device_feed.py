"""Device-side batch prefetching — no host stalls in the step loop.

The host pipeline (CTDataModule) decodes batches on background threads; this
wrapper additionally moves them to device (with the target sharding) ahead
of the consumer so jitted steps never wait on H2D transfer — the TPU-native
replacement for torch DataLoader's pin_memory + non-blocking copies
(reference utils/load_nrrd_dataset.py:105-109) and the BASELINE "stream
volumes without host stalls" requirement.

Multi-process (multihost) feeding: under ``jax.distributed`` each process
decodes only its slice of the global batch (CTDataModule's
process_index/process_count slicing — the per-rank DistributedSampler of
the reference's Lightning DDP, vqvae/train.py:27) and ``shard_batch``
assembles the logical global array from the process-local shards with
``jax.make_array_from_process_local_data`` so jitted steps see one global
batch laid out over the whole mesh without any cross-host data transfer.
"""
from __future__ import annotations

import collections
from typing import Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vqvae3d_tpu.parallel.mesh import batch_sharding, volume_sharding


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """Per-leaf NamedShardings for a train-step batch dict: 5-D volumes get
    ('data', 'space') layout, everything else dim-0 'data' sharding."""
    out = {}
    for k, v in batch.items():
        if np.ndim(v) == 5:
            out[k] = volume_sharding(mesh)
        else:
            out[k] = batch_sharding(mesh, ndim=max(1, np.ndim(v)))
    return out


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host batch dict → global jax.Arrays sharded over ``mesh``.

    Single-process: a plain sharded device_put. Multi-process: ``batch`` is
    this process's slice (global_batch/process_count rows, dim 0) and the
    returned arrays are logically global, built from the local shards only.
    """
    shardings = batch_shardings(mesh, batch)
    nproc = jax.process_count()
    if nproc == 1:
        return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        global_shape = (v.shape[0] * nproc, *v.shape[1:])
        out[k] = jax.make_array_from_process_local_data(
            shardings[k], v, global_shape
        )
    return out


def device_prefetch(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[object] = None,
    mesh: Optional[Mesh] = None,
) -> Iterator:
    """Yield batches that are already on device.

    iterator: yields pytrees of host arrays. mesh: shard each batch over it
    via ``shard_batch`` (required for multi-process feeding). sharding: a
    Sharding (or pytree of shardings) for jax.device_put; None = default
    device placement.
    """
    queue = collections.deque()

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
