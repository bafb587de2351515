"""Worker for tests/test_multihost_feed.py — one jax.distributed process.

Run as: python multihost_feed_worker.py <pid> <nproc> <port> <data_dir>

Each process decodes its slice of every global batch (CTDataModule
process_index/process_count), assembles logical global arrays with
shard_batch (jax.make_array_from_process_local_data), and prints per-batch
global statistics computed by a jitted reduction over the whole mesh.
The parent compares them against a single-process run of the same loader.
"""
import json
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    pid, nproc, port, data_dir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vqvae3d_tpu.data.ct_dataset import CTDataModule
    from vqvae3d_tpu.data.device_feed import device_prefetch
    from vqvae3d_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((jax.device_count(),), ("data",))

    dm = CTDataModule(
        data_dir,
        batch_size=4,
        train_frac=1.0,
        num_workers=2,
        size=(16, 16, None),
        output_depth=8,
    )

    @jax.jit
    def stats(batch):
        v = batch["volume"]
        return {
            "mean": jnp.mean(v),
            "sq": jnp.mean(v * v),
            "nv_sum": jnp.sum(batch["num_valid_slices"]),
        }

    out = []
    with mesh:
        for batch in device_prefetch(
            dm.train_dataloader(epoch=0, process_index=pid, process_count=nproc),
            mesh=mesh,
        ):
            assert batch["volume"].shape[0] == 4  # logically global
            s = stats(batch)  # reductions → fully-replicated scalars
            out.append({k: float(v) for k, v in s.items()})
    if pid == 0:
        print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
