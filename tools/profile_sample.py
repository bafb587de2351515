"""Split cached-sampler time into device execution vs host dispatch/glue
(VERDICT r3 #3/#6 — the host-sliced drivers pay one dispatch per slice;
this measures that cost instead of asserting it).

Three measurements on the host-sliced sampler at a published config:

  * wall     — full chained run (the BENCH_SAMPLE number's protocol)
  * dispatch — time for the same Python loop to merely ENQUEUE all slice
               executions (async dispatch returns once traced+enqueued;
               no final readback) — the host-side glue incl. donation
               bookkeeping and transfer of the i0 scalar
  * device   — per-slice on-device executable time from a jax.profiler
               trace ("XLA Modules" line; RTT-immune)

wall ≈ max(device, dispatch) + pipeline bubbles; the printed JSON carries
all three plus the residual.

Usage: python tools/profile_sample.py --level top|mid [--slices 8]
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def module_times(trace_dir: str):
    """[(name, ms)] whole-executable on-device times from the newest
    xplane.pb (same parsing as profile_step.analyze_xplane)."""
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane.pb under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    out = []
    for plane in xspace.planes:
        name = plane.name.lower()
        if not ("tpu" in name or "device" in name) or "host" in name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if "xla modules" not in line.name.lower():
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                out.append((md.display_name or md.name, ev.duration_ps / 1e9))
    return out


def build_top():
    """Returns (step(i0, carry), carry0, dims) with params/condition passed
    as jit ARGUMENTS — closing over them would bake the precomputed
    condition-layer caches (~hundreds of MB at the top grid) into the
    program as constants, which the remote AOT compile service rejects
    with HTTP 413 (discovered r5 — why r4 never recorded this split)."""
    from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
    from vqvae3d_tpu.train.prior_train import create_prior_train_state

    dims, batch = (128, 128, 32), 1
    cfg = PixelCNNConfig(
        input_dim=128, condition_dim=256, model_dim=16, num_resblocks=50,
        dropout_prob=0.0, dtype=jnp.bfloat16,
    )
    model = PixelCNN(cfg)
    init_batch = {
        "data": np.zeros((1, 4, 4, 2), np.int32),
        "condition": np.zeros((1, 1, 1, 1), np.int32),
    }
    params = create_prior_train_state(
        model, jax.random.PRNGKey(0), init_batch
    ).params
    cond = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (batch, 32, 32, 8)),
        jnp.int32,
    )
    from vqvae3d_tpu.sample.cached_sample import _build_slice_body

    def _step(params, cond, i0, carry):
        slice_body, _ = _build_slice_body(model, params, dims, batch, cond, 0.1)
        return slice_body(i0, carry)

    _, (x0, dvc0) = _build_slice_body(model, params, dims, batch, cond, 0.1)
    step = jax.jit(_step, donate_argnums=(3,))
    carry0 = (x0, jax.random.PRNGKey(0), dvc0)
    return (lambda i0, c: step(params, cond, i0, c)), carry0, dims


def build_mid():
    from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
    from vqvae3d_tpu.train.prior_train import create_prior_train_state

    dims, batch = (32, 32, 8), 10
    cfg = PixelSNAILConfig(
        input_dim=256, condition_dim=0, model_dim=256,
        num_layers_per_block=5, num_blocks=8,
        causal_dropout_prob=0.0, attention_dropout_prob=0.0,
        dtype=jnp.bfloat16,
    )
    model = PixelSNAIL(cfg)
    params = create_prior_train_state(
        model, jax.random.PRNGKey(0),
        {"data": np.zeros((1, 4, 4, 2), np.int32)},
    ).params
    from vqvae3d_tpu.sample.cached_snail import _build_slice_body

    def _step(params, i0, carry):
        slice_body, _ = _build_slice_body(model, params, dims, batch)
        return slice_body(i0, carry)

    step = jax.jit(_step, donate_argnums=(2,))
    _, inits = _build_slice_body(model, params, dims, batch)
    x0, kh0, vh0, kw0, vw0, logits0, dvc0, kd0, vd0 = inits
    rng = jax.random.PRNGKey(0)
    carry0 = (x0, rng, kh0, vh0, kw0, vw0, logits0, dvc0, kd0, vd0)
    return (lambda i0, c: step(params, i0, c)), carry0, dims


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", choices=("top", "mid"), default="top")
    p.add_argument("--slices", type=int, default=8,
                   help="slices to trace for device time")
    args = p.parse_args()
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    if args.level == "top":
        step, carry0, dims = build_top()
    else:
        step, carry0, dims = build_mid()
    s0 = dims[0]

    def fresh():
        return jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), carry0)

    # compile + warm
    t0 = time.perf_counter()
    carry = step(jnp.int32(0), fresh())
    jax.block_until_ready(carry)
    print(f"compile+warm: {time.perf_counter()-t0:.1f}s", flush=True)

    # full chained wall (readback forces completion)
    carry = fresh()
    t0 = time.perf_counter()
    for i0 in range(s0):
        carry = step(jnp.int32(i0), carry)
    float(jnp.sum(carry[0]))
    wall = time.perf_counter() - t0

    # enqueue-only: same loop, stop the clock when the LAST dispatch
    # returns (async: executions may still be running on device)
    carry = fresh()
    t0 = time.perf_counter()
    for i0 in range(s0):
        carry = step(jnp.int32(i0), carry)
    dispatch = time.perf_counter() - t0
    float(jnp.sum(carry[0]))  # drain before tracing

    # device time for a few slices
    trace_dir = tempfile.mkdtemp(prefix="sampletrace_")
    carry = fresh()
    jax.profiler.start_trace(trace_dir)
    for i0 in range(args.slices):
        carry = step(jnp.int32(i0), carry)
    float(jnp.sum(carry[0]))
    jax.profiler.stop_trace()
    mods = module_times(trace_dir)
    step_mods = [ms for name, ms in mods if "slice" in name.lower() or ms > 1.0]
    per_slice_dev = (
        sum(step_mods) / args.slices if step_mods else float("nan")
    )

    out = {
        "metric": f"sample_{args.level}_slice_split_ms",
        "value": round(wall / s0 * 1e3, 2),
        "unit": "ms/slice wall",
        "extra": {
            "slices": s0,
            "wall_sec_total": round(wall, 2),
            "wall_ms_per_slice": round(wall / s0 * 1e3, 2),
            "dispatch_ms_per_slice": round(dispatch / s0 * 1e3, 2),
            "device_ms_per_slice": round(per_slice_dev, 2),
            "unattributed_ms_per_slice": round(
                (wall / s0 - max(dispatch / s0, per_slice_dev / 1e3)) * 1e3, 2
            ),
            "traced_slices": args.slices,
            "n_modules_traced": len(step_mods),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
