"""Multi-process (multihost) data feeding correctness (VERDICT r1 #5).

Spawns TWO real jax.distributed processes on CPU (gloo collectives, 2
virtual devices each → a 4-device global mesh). Each process decodes only
its slice of every global batch (CTDataModule process_index/process_count —
the per-rank DistributedSampler of the reference's Lightning DDP,
vqvae/train.py:27) and shard_batch assembles the logical global array via
jax.make_array_from_process_local_data. The workers' jitted global batch
statistics must equal a single-process run over the same data: no dropped
and no duplicated samples.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

from vqvae3d_tpu.data import nrrd_io

HERE = Path(__file__).parent


def _write_fake_scan(path, shape=(16, 16, 6), spacing=(0.976, 0.976, 3)):
    rng = np.random.default_rng(abs(hash(path.name)) % 2**32)
    vol = rng.integers(-1000, 1500, size=shape).astype(np.int16)
    nrrd_io.write(path, vol, header={"spacings": spacing})


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_batch_semantics(tmp_path):
    for i in range(8):
        _write_fake_scan(tmp_path / f"scan{i}.nrrd")

    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(HERE / "multihost_feed_worker.py"),
                str(pid),
                "2",
                str(port),
                str(tmp_path),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    result_lines = [l for l in outs[0].splitlines() if l.startswith("RESULT ")]
    assert result_lines, outs[0][-3000:]
    got = json.loads(result_lines[0][len("RESULT "):])

    # single-process oracle: same loader, full global batches
    from vqvae3d_tpu.data.ct_dataset import CTDataModule

    dm = CTDataModule(
        str(tmp_path),
        batch_size=4,
        train_frac=1.0,
        num_workers=2,
        size=(16, 16, None),
        output_depth=8,
    )
    want = []
    for batch in dm.train_dataloader(epoch=0):
        v = batch["volume"].astype(np.float64)
        want.append(
            {
                "mean": float(v.mean()),
                "sq": float((v * v).mean()),
                "nv_sum": float(batch["num_valid_slices"].sum()),
            }
        )

    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g["nv_sum"] == w["nv_sum"]
        np.testing.assert_allclose(g["mean"], w["mean"], rtol=1e-5)
        np.testing.assert_allclose(g["sq"], w["sq"], rtol=1e-5)
