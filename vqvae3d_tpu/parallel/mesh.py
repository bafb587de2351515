"""Device-mesh and sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL
(/root/reference/vqvae/train.py:27, slurm-jobs/train_vqvae_3d.job). The
TPU-native equivalent: a ``jax.sharding.Mesh`` with axes

  * ``data``  — batch data-parallelism (the DDP analog),
  * ``space`` — optional spatial sharding of the volume's H axis for
    512×512×128 inputs whose activations outgrow one chip's HBM; XLA
    inserts halo exchanges for the stride/overlap of 3D convs over ICI.

All cross-device communication (gradient reductions, quantizer EMA cluster
stats — the reference's hand-written all_reduce at vqvae/layers.py:645-647)
is derived by GSPMD from these shardings; there are no hand-written
collectives in the model code.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Create a mesh over all (or the given) devices.

    Default: 1-D 'data' mesh over every addressable device. Pass
    mesh_shape=(d, s) with axis_names=('data', 'space') for combined
    batch × spatial sharding.
    """
    if devices is None:
        devices = jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    assert int(np.prod(mesh_shape)) == len(devices), (mesh_shape, len(devices))
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, tuple(axis_names))


def make_data_mesh(batch_size: int, devices=None) -> Mesh:
    """1-D 'data' mesh over the largest device count that divides the batch
    (a batch of 2 on an 8-device host → 2-device mesh; batch 1 → 1 device).
    Keeps jit in_shardings valid for any batch size."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while batch_size % n != 0:
        n -= 1
    return make_mesh((n,), ("data",), devices[:n])


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard dim 0 on 'data'; remaining dims replicated."""
    return NamedSharding(mesh, P("data", *(None,) * (ndim - 1)))


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, D, C) volumes: batch on 'data', H on 'space' if present."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "space", None, None, None))
    return NamedSharding(mesh, P("data", None, None, None, None))


# ---------------------------------------------------------------------------
# Quantizer sharding context
# ---------------------------------------------------------------------------
#
# GSPMD treats pallas_call as an opaque op: under a sharded batch it would
# all-gather the quantizer input and run the full kernel on every device.
# The fix (PERF.md roadmap / VERDICT r1 #2) is to shard_map the fused
# argmin+stats kernel so each device runs it on its local shard, with a
# trailing psum for the EMA cluster stats (the explicit form of the
# reference's all_reduce pair, vqvae/layers.py:645-647).
#
# The mesh is communicated to the (deeply nested) Quantizer module via this
# trace-time context, set by make_train_step/make_eval_step around the
# model application.

import contextlib
import threading

_QUANTIZER_MESH = threading.local()


@contextlib.contextmanager
def quantizer_sharding(mesh: Optional[Mesh]):
    """Trace-time context: quantizers shard_map their kernels over ``mesh``."""
    prev = getattr(_QUANTIZER_MESH, "mesh", None)
    _QUANTIZER_MESH.mesh = mesh
    try:
        yield
    finally:
        _QUANTIZER_MESH.mesh = prev


def current_quantizer_mesh() -> Optional[Mesh]:
    mesh = getattr(_QUANTIZER_MESH, "mesh", None)
    if mesh is not None and np.prod(mesh.devices.shape) == 1:
        return None  # single-device mesh: shard_map adds nothing
    return mesh
