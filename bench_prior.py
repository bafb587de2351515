"""Stage-2 (prior) train-step benchmark: published configs, honest protocol.

Covers the three published prior configs (slurm-jobs/train_pixelcnn_top.job,
train_pixelsnail_mid.job, train_pixelsnail_bottom.job — mirrored in jobs/):

  * top:    PixelCNN  50 x 16d, cond,   grid 128x128x32 (S = 524k voxels)
  * mid:    PixelSNAIL 8x5 x 256d, cond, grid 32x32x8   (S = 8192 -> attention)
  * bottom: PixelSNAIL 3x5 x 512d, uncond, grid 8x8x2   (S = 128)

The top config is the conv-bound one (model_dim 16 over half a million
voxels) — the target of the generic block-space conv rewrite
(ops/conv3d.py::conv3d block_rewrite); mid exercises the chunked causal
attention at S=8192. Timing protocol identical to bench_train.py:
state-chained slope + scalar readback (async-safe on the tunneled backend).

BENCH_PRIOR=top|mid|bottom|all selects; prints one JSON line per config.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import _cost_analysis, _peak_flops  # noqa: E402


def _bench(name, model, grid, cond_grid, batch, steps=3):
    from vqvae3d_tpu.train.prior_train import (
        create_prior_train_state,
        make_prior_train_step,
    )

    cfg = model.config
    rng = np.random.default_rng(0)
    batch_d = {
        "data": jnp.asarray(
            rng.integers(0, cfg.input_dim, (batch, *grid)), jnp.int32
        )
    }
    if cfg.use_conditioning:
        batch_d["condition"] = jnp.asarray(
            rng.integers(0, cfg.condition_dim, (batch, *cond_grid)), jnp.int32
        )

    state = create_prior_train_state(model, jax.random.PRNGKey(0), batch_d)
    train_step = make_prior_train_step(model, donate=False)
    step_rng = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    compiled = train_step.lower(state, batch_d, step_rng).compile()
    s1, log = compiled(state, batch_d, step_rng)
    float(log["loss_mean"])
    compile_s = time.perf_counter() - t0
    flops = _cost_analysis(compiled)["flops"]

    def timed_chain(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s, log = compiled(s, batch_d, step_rng)
        float(log["loss_mean"])  # scalar readback = true completion
        return time.perf_counter() - t0

    timed_chain(1)  # warmup
    t_lo = timed_chain(steps)
    t_hi = timed_chain(3 * steps)
    dt = max((t_hi - t_lo) / (2 * steps), 1e-6)

    extra = {
        "compile_sec": round(compile_s, 1),
        "backend": jax.default_backend(),
        "batch": batch,
        "grid": list(grid),
        "timing": "state-chained slope + scalar readback (async-safe)",
    }
    peak = _peak_flops()
    if flops:
        extra["flops_per_step"] = round(flops / 1e9, 2)  # GFLOP
        extra["achieved_tflops"] = round(flops / dt / 1e12, 2)
        if peak:
            extra["mfu"] = round(flops / dt / peak, 4)
            extra["device_kind"] = jax.devices()[0].device_kind
    print(
        json.dumps(
            {
                "metric": f"prior_{name}_train_step_ms",
                "value": round(dt * 1e3, 1),
                "unit": "ms",
                "extra": extra,
            }
        ),
        flush=True,
    )
    return dt


def main():
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
    from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig

    which = os.environ.get("BENCH_PRIOR", "all")
    if which in ("top", "all"):
        # jobs/train_pixelcnn_top.sh: 50 x 16d, conditioned, dropout 0, batch 1
        _bench(
            "top_pixelcnn",
            PixelCNN(
                PixelCNNConfig(
                    input_dim=128,
                    condition_dim=256,
                    model_dim=16,
                    num_resblocks=50,
                    dropout_prob=0.0,
                )
            ),
            (128, 128, 32),
            (32, 32, 8),
            batch=1,
        )
    if which in ("top_dropout",):
        # same top config at channel-dropout 0.5 (the published
        # pixelcnn mid/bottom jobs train at dropout 0.5) — exercises the
        # dropout-capable causal megakernel (masks streamed as data);
        # before r3 this config fell back to the remat scan at ~386 ms
        _bench(
            "top_pixelcnn_dropout05",
            PixelCNN(
                PixelCNNConfig(
                    input_dim=128,
                    condition_dim=256,
                    model_dim=16,
                    num_resblocks=50,
                    dropout_prob=0.5,
                )
            ),
            (128, 128, 32),
            (32, 32, 8),
            batch=1,
        )
    if which in ("mid", "all"):
        # jobs/train_pixelsnail_mid: 8 blocks x 5 layers x 256d, conditioned
        _bench(
            "mid_pixelsnail",
            PixelSNAIL(
                PixelSNAILConfig(
                    input_dim=256,
                    condition_dim=512,
                    model_dim=256,
                    num_blocks=8,
                    num_layers_per_block=5,
                )
            ),
            (32, 32, 8),
            (8, 8, 2),
            batch=1,
        )
    if which in ("bottom", "all"):
        # jobs/train_pixelsnail_bottom.sh: 3x5 x 512d, uncond, batch 6
        _bench(
            "bottom_pixelsnail",
            PixelSNAIL(
                PixelSNAILConfig(
                    input_dim=512,
                    condition_dim=0,
                    model_dim=512,
                    num_blocks=3,
                    num_layers_per_block=5,
                    mixup_alpha=0.4,
                )
            ),
            (8, 8, 2),
            None,
            batch=6,
        )


if __name__ == "__main__":
    main()
