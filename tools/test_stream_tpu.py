"""Real-TPU smoke test for the streaming-io stack megakernel.

Exercises the lane-padding path (non-128-multiple c8) and the 512-res
level-0 stack shape from PERF.md. Run: python tools/test_stream_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.ops import stack_kernel as sk


def make(nb, b, d, h, w, c8, cb8=None, dtype=jnp.float32, seed=0):
    cb8 = cb8 or c8
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (b, d, h, w, c8), dtype) * 0.5
    w1 = jax.random.normal(ks[1], (nb, c8, cb8), dtype) * 0.2
    w2 = jax.random.normal(ks[2], (nb, 3, 3, 3, cb8, cb8), dtype) * 0.05
    w3 = jax.random.normal(ks[3], (nb, cb8, c8), dtype) * 0.2
    sc = jax.random.normal(ks[4], (nb, 8), jnp.float32) * 0.1
    return x, (w1, w2, w3, sc)


def run(x, blocks, pad_mode):
    w1, w2, w3, sc = blocks
    return sk.preact_stack_fused(x, w1, w2, w3, sc, pad_mode, False)


def run_jax_ref(x, blocks, pad_mode):
    """Pure-JAX reference of the kernel math (same f32 dot accumulation +
    dtype casts), for shapes where the resident kernel can't run."""
    w1s, w2s, w3s, scs = blocks
    dt = x.dtype

    def elu(z):
        zf = z.astype(jnp.float32)
        return jnp.where(zf > 0, zf, jnp.exp(jnp.minimum(zf, 0.0)) - 1.0).astype(z.dtype)

    for i in range(w1s.shape[0]):
        b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = [
            scs[i, j].astype(dt) for j in range(8)
        ]
        a1 = elu(x + b1a) + b1b
        u1 = jax.lax.dot_general(
            a1, w1s[i], (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        a2 = elu(u1 + b2a) + b2b
        mode = "wrap" if pad_mode == "wrap" else "constant"
        a2p = jnp.pad(a2, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode=mode)
        conv = jax.lax.conv_general_dilated(
            a2p.astype(jnp.float32), w2s[i].astype(jnp.float32),
            (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(dt)
        a3 = elu(conv + b3a) + b3b
        u3 = jax.lax.dot_general(
            a3, w3s[i], (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        x = x + u3 * scale + b4
    return x


def check(name, nb, b, d, h, w, c8, cb8=None, dtype=jnp.float32, grads=True,
          reference="resident"):
    """reference='resident' compares bit-exactly against the resident
    kernel; 'jax' compares (with tolerance) against the pure-JAX math for
    shapes where the resident kernel exceeds VMEM."""
    x, blocks = make(nb, b, d, h, w, c8, cb8, dtype)

    def ref_run(x, blocks, pad_mode):
        if reference == "resident":
            return run(x, blocks, pad_mode)
        return run_jax_ref(x, blocks, pad_mode)

    try:
        sk._MAX_VOLUME_BYTES = 0  # force streaming
        y = jax.block_until_ready(run(x, blocks, "wrap"))
        sk._MAX_VOLUME_BYTES = 10**12
        yref = jax.block_until_ready(ref_run(x, blocks, "wrap"))
        err = float(jnp.max(jnp.abs(y - yref)))
        msg = f"{name}: fwd maxerr={err:.2e}"
        if grads:
            def loss(run_f, x, blocks):
                return jnp.sum(
                    jnp.sin(run_f(x, blocks, "wrap").astype(jnp.float32))
                )

            sk._MAX_VOLUME_BYTES = 0
            g = jax.block_until_ready(
                jax.grad(lambda *a: loss(run, *a), argnums=(0, 1))(x, blocks)
            )
            sk._MAX_VOLUME_BYTES = 10**12
            gref = jax.block_until_ready(
                jax.grad(lambda *a: loss(ref_run, *a), argnums=(0, 1))(x, blocks)
            )
            gerr = max(
                float(jnp.max(jnp.abs(a - b)))
                / max(float(jnp.max(jnp.abs(b))), 1e-30)
                for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gref))
            )
            msg += f" grad relerr={gerr:.2e}"
        print(msg)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return False
    finally:
        sk._MAX_VOLUME_BYTES = 8 * 1024 * 1024


def bench(name, nb, b, d, h, w, c8, cb8, dtype=jnp.bfloat16, streaming=True):
    x, blocks = make(nb, b, d, h, w, c8, cb8, dtype)
    sk._MAX_VOLUME_BYTES = 0 if streaming else 10**12
    try:
        def loss(x, blocks):
            return jnp.sum(run(x, blocks, "wrap").astype(jnp.float32))

        f = jax.jit(jax.grad(loss))
        g = jax.block_until_ready(f(x, blocks))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            x2 = x + g * 1e-6  # chain so executions serialize
            g = f(x2, blocks)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: fwd+bwd {dt*1e3:.1f} ms/call")
    except Exception as e:
        print(f"{name}: BENCH FAIL {type(e).__name__}: {str(e)[:300]}")
    finally:
        sk._MAX_VOLUME_BYTES = 8 * 1024 * 1024


if __name__ == "__main__":
    print(jax.devices())
    check("small c8=128", 3, 1, 8, 8, 8, 128)
    check("small c8=144 (lane pad)", 3, 1, 8, 8, 8, 144, 72)
    check("small c8=16 (lane pad)", 3, 1, 8, 8, 8, 16, 8)
    # 512-res level-0 stack shape (PERF.md): (64,64,16)×144, cb8=72, bf16.
    # The resident kernel can't run this (33 MB volume) — compare against
    # the pure-JAX math with bf16 tolerance instead.
    check(
        "512-res L0 shape bf16",
        4, 1, 64, 64, 16, 144, 72, dtype=jnp.bfloat16, grads=True,
        reference="jax",
    )
    bench("512-res L0 50-block stream", 50, 1, 64, 64, 16, 144, 72)
