"""Train-step benchmark: published configs at 256 and 512 res, with MFU.

bench.py is the driver's headline (eval throughput); this tool reports the
TRAINING side (VERDICT r1 #6): full forward+backward+optimizer step time,
compiled FLOPs (XLA cost analysis) and MFU vs chip peak, for

  * 256×256×128, 2-level reference-downscaled config
    (train_vqvae_3d_downscaled.job), and
  * 512×512×128, 3-level full config via the space-to-depth stem
    (the repo's single-chip 512-res training path).

Prints one JSON line per config. BENCH_TRAIN_RES=256|512|both selects.
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


def bench_train(res: int, steps: int = 3):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
    from vqvae3d_tpu.train.state import create_vqvae_train_state
    from vqvae3d_tpu.train.vqvae_train import make_train_step

    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    if res == 256:
        cfg = VQVAEConfig(
            n_bottleneck_blocks=2,
            num_embeddings=(128, 256),
            n_pre_quantization_blocks=150,
            n_post_quantization_blocks=150,
            n_post_upscale_blocks=5,
            n_post_downscale_blocks=5,
            dtype=jnp.bfloat16,
            stem_space_to_depth=2,
            base_network_channels=8,
            remat=remat,
        )
        depth = 128
    else:
        cfg = VQVAEConfig(
            n_bottleneck_blocks=3,
            num_embeddings=(128, 256, 512),
            n_pre_quantization_blocks=50,
            n_post_quantization_blocks=50,
            n_post_upscale_blocks=3,
            n_post_downscale_blocks=2,
            dtype=jnp.bfloat16,
            stem_space_to_depth=2,
            base_network_channels=8,
            remat=remat,
        )
        depth = 128

    model = VQVAE(cfg)
    # init volume: smallest size divisible by stem × 4^levels on every axis
    # (conv params are shape-agnostic; only the init trace needs validity)
    f = cfg.stem_space_to_depth * 4**cfg.n_bottleneck_blocks
    state = create_vqvae_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, f, f, f, 1), jnp.bfloat16)
    )
    train_step = make_train_step(model, donate=False)
    rng = np.random.default_rng(0)
    vol = rng.uniform(-0.5, 4.0, (1, res, res, depth, 1)).astype(np.float32)
    if cfg.stem_space_to_depth > 1:
        # match the train CLI feed path: host-pre-folded volumes
        # (CTDataModule fold=f / fold_volume_np)
        from vqvae3d_tpu.data.ct_dataset import fold_volume_np

        vol = fold_volume_np(vol, cfg.stem_space_to_depth)
    batch = {
        "volume": jnp.asarray(vol, jnp.bfloat16),
        "num_valid_slices": jnp.full((1,), depth, jnp.int32),
    }

    # Honest timing on the tunneled backend (see bench.py): successive
    # steps chain through `state` (a real data dependency, so executions
    # serialize on-device); a scalar host readback forces completion; the
    # slope between two chain lengths cancels the constant sync overhead.
    t0 = time.perf_counter()
    lowered = jax.jit(train_step).lower(state, batch)
    compiled = lowered.compile()
    state1, log = compiled(state, batch)
    float(log["loss"])
    compile_s = time.perf_counter() - t0
    flops = _cost_analysis(compiled)["flops"]

    def timed_chain(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s, log = compiled(s, batch)
        float(log["loss"])  # scalar readback = true completion
        return time.perf_counter() - t0

    timed_chain(1)  # warmup
    t_lo = timed_chain(steps)
    t_hi = timed_chain(3 * steps)
    dt = max((t_hi - t_lo) / (2 * steps), 1e-6)

    extra = {
        "compile_sec": round(compile_s, 1),
        "backend": jax.default_backend(),
        "levels": cfg.n_bottleneck_blocks,
        "blocks": cfg.n_pre_quantization_blocks,
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
                "metric": f"{res}x{res}x{depth}_train_step_ms",
                "value": round(dt * 1e3, 1),
                "unit": "ms",
                "extra": extra,
            }
        ),
        flush=True,
    )
    return dt


def main():
    which = os.environ.get("BENCH_TRAIN_RES", "both")
    if which in ("256", "both"):
        bench_train(256)
    if which in ("512", "both"):
        bench_train(512)


if __name__ == "__main__":
    main()
