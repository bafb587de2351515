"""Profile the VQ-VAE train step on the current backend and print a per-op
time breakdown from the captured xplane trace.

Usage:
    python tools/profile_step.py --res 256 --full-blocks 0 --steps 3
    python tools/profile_step.py --res 512 --stem 2 --base 8

Parses the raw .xplane.pb with the TF profiler protos (no TensorBoard UI
needed) and prints the top ops by self-time on the device plane — the tool
behind PERF.md's bottleneck tables.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--depth", type=int, default=128)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--levels", type=int, default=2)
    p.add_argument("--blocks", type=int, default=None,
                   help="pre/post-q blocks (default: published config)")
    p.add_argument("--stem", type=int, default=2)
    p.add_argument("--base", type=int, default=8)
    p.add_argument("--trace-dir", type=str, default=None)
    p.add_argument("--eval", action="store_true", help="profile eval instead")
    p.add_argument("--top", type=int, default=40)
    return p.parse_args()


def analyze_xplane(trace_dir: str, top: int = 40):
    """Sum per-op self-times on the device plane of the newest xplane.pb."""
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:  # TF ≥2.21 moved the proto under tsl
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane.pb under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total_ps = 0
    modules = []
    for plane in xspace.planes:
        name = plane.name.lower()
        if not ("tpu" in name or "device" in name or "gpu" in name):
            continue
        if "host" in name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            if "xla modules" in lname:
                # whole-executable on-device times: the dispatch/RTT-immune
                # step-time metric (wall clocks through the axon tunnel are
                # noisy — see PERF.md "timing methodology")
                for ev in line.events:
                    md = ev_meta[ev.metadata_id]
                    modules.append(
                        (md.display_name or md.name, ev.duration_ps / 1e9)
                    )
                continue
            # XLA op lines carry per-HLO events; step lines etc. skipped
            if "xla op" not in lname and "ops" != lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                dur = ev.duration_ps
                total_ps += dur
                op = md.display_name or md.name
                per_op[op] += dur
                # crude categorization by op name
                base = op.split(".")[0].split("_")[0]
                per_cat[base] += dur

    if modules:
        print("\n=== on-device executable times (per run) ===")
        for mname, ms in modules:
            print(f"{ms:10.3f} ms  {mname[:100]}")

    print(f"\n=== device op time breakdown ({total_ps/1e9:.3f} ms total) ===")
    for op, ps in per_op.most_common(top):
        print(f"{ps/1e9:10.3f} ms  {100*ps/max(total_ps,1):5.1f}%  {op[:120]}")
    print("\n=== by category ===")
    for cat, ps in per_cat.most_common(25):
        print(f"{ps/1e9:10.3f} ms  {100*ps/max(total_ps,1):5.1f}%  {cat}")
    return per_op, total_ps


def main():
    args = parse_args()
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
    from vqvae3d_tpu.train.state import create_vqvae_train_state
    from vqvae3d_tpu.train.vqvae_train import make_eval_step, make_train_step

    if args.blocks is None:
        args.blocks = 150 if args.levels == 2 else 50
    cfg = VQVAEConfig(
        n_bottleneck_blocks=args.levels,
        num_embeddings=(128, 256, 512)[: args.levels],
        n_pre_quantization_blocks=args.blocks,
        n_post_quantization_blocks=args.blocks,
        n_post_upscale_blocks=5 if args.levels == 2 else 3,
        n_post_downscale_blocks=5 if args.levels == 2 else 2,
        dtype=jnp.bfloat16,
        stem_space_to_depth=args.stem,
        base_network_channels=args.base,
    )
    model = VQVAE(cfg)
    shape = (args.batch, args.res, args.res, args.depth, 1)
    rng = np.random.default_rng(0)
    vol = rng.uniform(-0.5, 4.0, shape).astype(np.float32)
    if not args.eval and args.stem > 1:
        # match the train CLI's feed path: volumes arrive host-pre-folded
        # (CTDataModule fold=f), so the in-jit C=1-minor relayout is gone
        from vqvae3d_tpu.data.ct_dataset import fold_volume_np

        vol = fold_volume_np(vol, args.stem)
    batch = {
        "volume": jnp.asarray(vol, jnp.bfloat16),
        "num_valid_slices": jnp.full((args.batch,), args.depth, jnp.int32),
    }
    f = cfg.stem_space_to_depth * 4**cfg.n_bottleneck_blocks
    state = create_vqvae_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, f, f, f, 1), jnp.bfloat16)
    )
    # re-init on the real shape is unnecessary: conv params are shape-agnostic
    if args.eval:
        step_fn = make_eval_step(model)
        run = lambda s, b: step_fn(s, b)
    else:
        train_step = make_train_step(model, donate=False)
        run = lambda s, b: train_step(s, b)[0]

    import time

    t0 = time.perf_counter()
    out = run(state, batch)
    jax.block_until_ready(out)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

    # honest step time (see bench.py): chain state through steps, scalar
    # host readback for true completion, slope cancels sync overhead
    if args.eval:
        # no state to chain: distinct inputs (defeats any dedup) and a
        # per-iteration scalar readback; the slope cancels the RTT cost
        def timed(n):
            t0 = time.perf_counter()
            for i in range(n):
                b = dict(batch)
                b["volume"] = batch["volume"] + jnp.bfloat16(i * 1e-6)
                log = step_fn(state, b)
                float(log["loss"])
            return time.perf_counter() - t0
    else:
        def timed(n):
            s = state
            t0 = time.perf_counter()
            for _ in range(n):
                s, log = train_step(s, batch)
            float(log["loss"])
            return time.perf_counter() - t0

    timed(1)
    t_lo = timed(args.steps)
    t_hi = timed(3 * args.steps)
    dt = max((t_hi - t_lo) / (2 * args.steps), 1e-6)
    print(f"step time: {dt*1e3:.1f} ms (chained+readback slope)", flush=True)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        out = run(state, batch)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    per_op, total = analyze_xplane(trace_dir, args.top)
    print(f"\n(per-op totals cover 2 traced steps; trace: {trace_dir})")


if __name__ == "__main__":
    main()
