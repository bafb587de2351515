"""Per-op profile of the bench.py eval forward (encode+quantize+decode,
full reference config) — the tool behind PERF.md's eval bottleneck notes.

Usage: python tools/profile_bench.py [--batch 4] [--stem 2] [--top 40]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--stem", type=int, default=2)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--full-blocks", type=int, default=1)
    args = p.parse_args()

    from vqvae3d_tpu.cli.common import enable_compilation_cache
    from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
    from tools.profile_step import analyze_xplane

    enable_compilation_cache()
    full = bool(args.full_blocks)
    cfg = VQVAEConfig(
        n_bottleneck_blocks=3,
        num_embeddings=(128, 256, 512),
        n_pre_quantization_blocks=50 if full else 2,
        n_post_quantization_blocks=50 if full else 2,
        n_post_upscale_blocks=3 if full else 1,
        n_post_downscale_blocks=2 if full else 1,
        dtype=jnp.bfloat16,
        remat=False,
        stem_space_to_depth=args.stem,
        base_network_channels=4 * args.stem,
    )
    model = VQVAE(cfg)
    rng = jax.random.PRNGKey(0)
    f = cfg.stem_space_to_depth * 4**cfg.n_bottleneck_blocks
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, jnp.zeros((1, f, f, f, 1), jnp.bfloat16), train=False
    )

    @jax.jit
    def fwd(variables, x):
        decoded, _ = model.apply(variables, x, train=False)
        return decoded

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 4.0, (args.batch, 512, 512, 128, 1)),
        jnp.bfloat16,
    )
    t0 = time.perf_counter()
    out = fwd(variables, x0)
    jax.block_until_ready(out)
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        out = fwd(variables, x0)
        jax.block_until_ready(out)
        print(f"warm run {i}: {time.perf_counter()-t0:.3f}s", flush=True)

    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_bench_")
    print(f"tracing into {trace_dir}", flush=True)
    jax.profiler.start_trace(trace_dir)
    out = fwd(variables, x0)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)
    analyze_xplane(trace_dir, args.top)
    print(f"\n(per-op totals cover 1 traced run of batch {args.batch}; "
          f"trace: {trace_dir})")


if __name__ == "__main__":
    main()
