"""Multi-host (multi-slice / DCN) runtime setup.

The reference scales over nodes with SLURM `srun` + Lightning's env-based
NCCL rendezvous (slurm-jobs/train_vqvae_3d.job:4-7,98). The TPU-native
equivalent is one JAX process per host with ``jax.distributed.initialize``;
after that every jit in this package sees the global device set, and the
('data', 'space') mesh helpers lay batch DP across hosts (DCN) while keeping
spatial sharding — whose conv halo exchanges are latency-sensitive — within
a slice (ICI).

Typical SLURM usage (one process per host):

    python -m vqvae3d_tpu.cli.train_vqvae ... \
        --multihost --coordinator $MASTER_ADDR:8476

Process id/count are taken from the env when available (TPU pods populate
them automatically; SLURM_PROCID/SLURM_NTASKS otherwise).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh

from vqvae3d_tpu.parallel.mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed, inferring ids from SLURM/TPU env vars."""
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
    if process_id is None and "SLURM_PROCID" in os.environ:
        process_id = int(os.environ["SLURM_PROCID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_hybrid_mesh(space: int = 1) -> Mesh:
    """('data', 'space') mesh that keeps each 'space' group inside one slice.

    Uses mesh_utils.create_hybrid_device_mesh when multiple slices are
    present so the spatial axis (conv halos every layer) rides ICI and only
    batch-DP gradient reductions cross DCN.
    """
    from jax.experimental import mesh_utils

    n = jax.device_count()
    assert n % space == 0
    data = n // space
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data // max(1, jax.process_count()), space),
            dcn_mesh_shape=(jax.process_count(), 1),
        )
        return Mesh(devices, ("data", "space"))
    except Exception:
        # single-slice / CPU fallback
        return make_mesh((data, space), ("data", "space"))


def is_primary() -> bool:
    return jax.process_index() == 0
