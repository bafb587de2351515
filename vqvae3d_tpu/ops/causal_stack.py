"""Block-space (space-to-depth) scanned runner for causal resblock stacks.

Why (profiled on v5e, PERF.md "Stage-2"): the published top-level prior
(PixelCNN 50 blocks x model_dim 16 over the 128x128x32 code grid —
/root/reference/slurm-jobs/train_pixelcnn_top.job) runs every conv at 4-16
channels over 524k voxels. XLA materializes those tensors 8-32x lane-padded,
and the per-conv space-to-depth round trips of the generic block rewrite
(ops/conv3d.py) add full-volume relayouts per conv: the per-op trace of the
540 ms/step baseline was 93% slice/copy/async-copy and <1% compute.

This module runs the ENTIRE mask-'B' segment of the stack in 2x block space
(one fold at entry, one unfold at exit) as ONE ``lax.scan`` over leaf-stacked
per-block parameters:

  * every 1x1x1 conv (branch_conv1/3, ExpandRF, condition) becomes a lane-
    dense (8C -> 8Cb) matmul via the phase-block-diagonal embedding
    (ops/s2d_conv.py::conv1x1_block_kernel),
  * each stream's causal k-conv embeds exactly into block space with its
    asymmetric front padding (stride1_block_kernel — handles the causal pads
    of reference pixel_model/layers.py:193-215),
  * elementwise ops (elu, Fixup scalars, residual, channel dropout) are
    phase-invariant and commute with space_to_depth verbatim; the channel-
    dropout mask folds by tiling the (C,) keep mask over the 8 phases.

Semantics are exactly models/causal_blocks.py::PreActFixupCausalResBlock in
mask-'B' mode (which mirrors reference pixel_model/layers.py:338-497);
equivalence at dropout=0 is tested against the naive module loop in
tests/test_causal_stack.py. The parameter tree is IDENTICAL to the naive
loop's (CausalPreActParams declares the same flax paths), so checkpoints and
the torch converter are unaffected.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqvae3d_tpu.ops import s2d_conv
from vqvae3d_tpu.ops.conv3d import conv3d
from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth
from vqvae3d_tpu.ops.s2d_conv import conv1x1_block_kernel, stride1_block_kernel

Stack = Tuple[jax.Array, jax.Array, jax.Array]


def causal_conv_pads(kernel_size: int):
    """Original-space (kernel shape, pad) per stream for a mask-'B'
    CausalConv3dAdd of odd ``kernel_size`` (models/causal_blocks.py:104-146,
    mirroring reference layers.py:193-215)."""
    k = kernel_size
    h = k // 2
    d_size, h_size, w_size = max(k - 1, 1), max(k - 1, 1), max(h + 1, 1)
    return (
        ((d_size, k, k), ((d_size - 1, 0), (h, h), (h, h))),
        ((1, h_size, k), ((0, 0), (h_size - 1, 0), (h, h))),
        ((1, 1, w_size), ((0, 0), (0, 0), (w_size - 1, 0))),
    )


def causal_stack_ok(
    channels: int,
    spatial: Tuple[int, int, int],
    n_blocks: int,
    *,
    concat_activation: bool = False,
    kernel_size: int = 3,
) -> bool:
    """Should a mask-'B' causal stack run in block space?

    Gates mirror ops/s2d_conv.block_stack_ok: small channels (the lane-
    padding tax), big even grid (fold needs even dims; tiny grids are
    op-overhead-bound and fine as-is — the mid/bottom PixelSNAIL levels).
    concat_activation doubles channels mid-block with grouped convs — not
    supported here (the reference never enables it in published configs).
    """
    if concat_activation or kernel_size % 2 == 0:
        return False
    if channels > 32:
        return False
    if any(s % 2 for s in spatial):
        return False
    if int(spatial[0]) * spatial[1] * spatial[2] < s2d_conv._MIN_VOXELS:
        return False
    return n_blocks >= 1


def fold_causal_block_params(params, kernel_size: int):
    """Embed ONE block's parameters (from CausalPreActParams) into 2x block
    space. Returns a pytree of jnp arrays — vmap over leaf-stacked blocks.

    params: (w1(3), expand(w_dc, b_dc, w_h2w, b_h2w), w2(3), cond(wc, bc) or
    None, w3(3), scalars(8)) with stock NDHWC kernel shapes.
    """
    w1, expand, w2, cond, w3, scalars = params
    cb = w1[0].shape[-1]

    def flat1x1(w):
        return conv1x1_block_kernel(w)[0, 0, 0]

    w1f = tuple(flat1x1(w) for w in w1)
    w3f = tuple(flat1x1(w) for w in w3)

    w_dc, b_dc, w_h2w, b_h2w = expand
    # ExpandRF's depth conv outputs 2*cb then splits channel halves —
    # the halves fold separately (the folded lane order interleaves phases).
    w_d2h = flat1x1(w_dc[..., :cb])
    w_d2w = flat1x1(w_dc[..., cb:])
    b_d2h = jnp.tile(b_dc[:cb], 8)
    b_d2w = jnp.tile(b_dc[cb:], 8)
    ef = (w_d2h, b_d2h, w_d2w, b_d2w, flat1x1(w_h2w), jnp.tile(b_h2w, 8))

    w2f = []
    for w, (_, pad) in zip(w2, causal_conv_pads(kernel_size)):
        wb, _ = stride1_block_kernel(w, pad)
        w2f.append(wb)
    w2f = tuple(w2f)

    condf = None
    if cond is not None:
        wc, bc = cond
        condf = (flat1x1(wc), jnp.tile(bc, 8))

    return (w1f, ef, w2f, condf, w3f, tuple(scalars))


def folded_causal_pads(kernel_size: int):
    """Static block-space pads of the three folded causal convs."""
    pads = []
    for shape, pad in causal_conv_pads(kernel_size):
        w = jnp.zeros((*shape, 1, 1), jnp.float32)
        _, pad_b = stride1_block_kernel(w, pad)
        pads.append(pad_b)
    return tuple(pads)


def _dot(x, w):
    return jax.lax.dot_general(
        x, w.astype(x.dtype), dimension_numbers=(((x.ndim - 1,), (0,)), ((), ()))
    )


def folded_1x1(x_f: jax.Array, w: jax.Array, b: Optional[jax.Array]) -> jax.Array:
    """A stock (1,1,1,C,Co)+bias conv applied to a 2x-folded activation:
    phase-block-diagonal matmul + phase-tiled bias. Exact."""
    y = _dot(x_f, conv1x1_block_kernel(w)[0, 0, 0])
    if b is not None:
        y = y + jnp.tile(b, 8).astype(y.dtype)
    return y


def shifted_1x1_pads():
    """Original-space (kernel shape, pad) per stream for the mask-'A'
    shift-then-1x1 (models/causal_blocks.py::CausalConv3dAdd mask='A',
    kernel_size=1 — the shift folds into a 2-tap conv whose second tap is
    zero: y[i] = w·x[i-1])."""
    return (
        ((2, 1, 1), ((1, 0), (0, 0), (0, 0))),
        ((1, 2, 1), ((0, 0), (1, 0), (0, 0))),
        ((1, 1, 2), ((0, 0), (0, 0), (1, 0))),
    )


def _fold_shifted_1x1(w: jax.Array, stream: int):
    """(1,1,1,C,Co) -> block-space kernel of the stream's shift-then-1x1."""
    shape, pad = shifted_1x1_pads()[stream]
    wext = jnp.zeros((*shape, *w.shape[3:]), w.dtype)
    wext = wext.at[0, 0, 0].set(w[0, 0, 0])
    return stride1_block_kernel(wext, pad)


def fold_causal_block_params_A(params, kernel_size: int):
    """Embed a mask-'A' block's parameters (CausalPreActParamsA values)
    into 2x block space. Same layout as fold_causal_block_params plus the
    shift-folded w1 (list of (kernel, pad) pairs — the 'A' shifts make
    branch_conv1 a 2-tap conv) and the skip projection."""
    w1, expand, w2, cond, w3, scalars, skip = params
    base = fold_causal_block_params(
        (w1, expand, w2, cond, w3, scalars), kernel_size
    )
    _, ef, w2f, condf, w3f, sc = base
    w1sf = tuple(_fold_shifted_1x1(w, s) for s, w in enumerate(w1))
    skipf = tuple(
        (*_fold_shifted_1x1(w, s), jnp.tile(b, 8))
        for s, (w, b) in enumerate(skip)
    )
    return (w1sf, ef, w2f, condf, w3f, sc, skipf)


def causal_preact_block_A_folded(
    stack: Stack,
    pa,
    cond_f: Optional[jax.Array],
    *,
    kernel_size: int,
    dropout_prob: float,
    train: bool,
    rng: Optional[jax.Array],
) -> Stack:
    """One mask-'A' PreActFixupCausalResBlock on folded streams. Mirrors
    models/causal_blocks.py::PreActFixupCausalResBlock (mask='A') step for
    step: the one-time causal shifts fold into branch_conv1 and skip_conv
    kernels (zero-padded 2-tap convs in block space)."""
    w1sf, ef, w2f, condf, w3f, scalars, skipf = pa
    pads2 = folded_causal_pads(kernel_size)
    dt = stack[0].dtype

    def s(i):
        return scalars[i].astype(dt)

    act = jax.nn.elu
    out = tuple(
        conv3d(act(x + s(0)) + s(1), wf, padding=pb, block_rewrite=False)
        for x, (wf, pb) in zip(stack, w1sf)
    )

    w_d2h, b_d2h, w_d2w, b_d2w, w_h2w, b_h2w = ef
    od, oh, ow = out
    d2h = _dot(od, w_d2h) + b_d2h.astype(dt)
    d2w = _dot(od, w_d2w) + b_d2w.astype(dt)
    h2w = _dot(oh, w_h2w) + b_h2w.astype(dt)
    out = (od, oh + d2h, ow + h2w + d2w)

    out = tuple(
        conv3d(act(x + s(2)) + s(3), wf, padding=pb, block_rewrite=False)
        for x, wf, pb in zip(out, w2f, pads2)
    )

    if dropout_prob > 0 and train:
        rngs = jax.random.split(rng, 3)
        out = tuple(
            _channel_dropout_folded(x, dropout_prob, r)
            for x, r in zip(out, rngs)
        )

    if condf is not None:
        wc, bc = condf
        cnd = _dot(cond_f, wc) + bc.astype(dt)
        out = tuple(x + cnd for x in out)

    out = tuple(_dot(act(x + s(4)) + s(5), wf) for x, wf in zip(out, w3f))
    scale = scalars[7].astype(dt)
    skip = tuple(
        conv3d(x, wf, padding=pb, block_rewrite=False) + bb.astype(dt)
        for x, (wf, pb, bb) in zip(stack, skipf)
    )
    return tuple(o * scale + s(6) + sk for o, sk in zip(out, skip))


def union_dropout_masks(
    rng, n_blocks: int, b: int, cb8: int, rate: float
) -> jax.Array:
    """Per-block 0/1 keep masks in the union kernel's lane order
    (NB, B, 3*cb8): block i draws fold_in(rng, i) → split 3 → per-stream
    bernoulli over ORIGINAL channels tiled over the 8 fold phases — the
    EXACT sequence the scan path's _channel_dropout_folded consumes, so
    kernel and scan sample identical subnetworks for the same rng."""
    c = cb8 // 8

    def one(r):
        r3 = jax.random.split(r, 3)
        ms = []
        for s in range(3):
            keep = jax.random.bernoulli(r3[s], 1.0 - rate, (b, 1, 1, 1, c))
            ms.append(jnp.tile(keep, (1, 1, 1, 1, 8)).reshape(b, cb8))
        return jnp.concatenate(ms, axis=-1)

    rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
        jnp.arange(n_blocks)
    )
    return jax.vmap(one)(rngs).astype(jnp.float32)


def _channel_dropout_folded(x, rate: float, rng):
    """torch Dropout3d on a folded stream: one keep decision per ORIGINAL
    channel, tiled over the 8 phases (fold lane order is (phase, c), c
    fastest — ops/resize.space_to_depth)."""
    b = x.shape[0]
    c8 = x.shape[-1]
    c = c8 // 8
    keep = jax.random.bernoulli(rng, 1.0 - rate, (b, 1, 1, 1, c))
    keep = jnp.tile(keep, (1, 1, 1, 1, 8))
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def causal_preact_block_folded(
    stack: Stack,
    p,
    cond_f: Optional[jax.Array],
    *,
    pads2,
    dropout_prob: float,
    train: bool,
    rng: Optional[jax.Array],
) -> Stack:
    """One mask-'B' PreActFixupCausalResBlock on folded (B,D/2,H/2,W/2,8C)
    streams. Mirrors models/causal_blocks.py::PreActFixupCausalResBlock
    (itself reference layers.py:338-497) step for step."""
    w1f, ef, w2f, condf, w3f, scalars = p
    d, h, w = stack
    dt = d.dtype

    def s(i):
        return scalars[i].astype(dt)

    act = jax.nn.elu
    # bias1a/1b + branch_conv1 (1x1x1 per stream)
    out = tuple(_dot(act(x + s(0)) + s(1), wf) for x, wf in zip(stack, w1f))

    # ExpandRF: depth feeds height & width, height feeds width
    w_d2h, b_d2h, w_d2w, b_d2w, w_h2w, b_h2w = ef
    od, oh, ow = out
    d2h = _dot(od, w_d2h) + b_d2h.astype(dt)
    d2w = _dot(od, w_d2w) + b_d2w.astype(dt)
    h2w = _dot(oh, w_h2w) + b_h2w.astype(dt)
    out = (od, oh + d2h, ow + h2w + d2w)

    # bias2a/2b + causal k-conv per stream (folded kernels, exact pads)
    out = tuple(
        conv3d(act(x + s(2)) + s(3), wf, padding=pb, block_rewrite=False)
        for x, wf, pb in zip(out, w2f, pads2)
    )

    if dropout_prob > 0 and train:
        rngs = jax.random.split(rng, 3)
        out = tuple(
            _channel_dropout_folded(x, dropout_prob, r) for x, r in zip(out, rngs)
        )

    if condf is not None:
        wc, bc = condf
        cnd = _dot(cond_f, wc) + bc.astype(dt)
        out = tuple(x + cnd for x in out)

    # bias3a/3b + branch_conv3 + scale/bias4 + identity skip
    out = tuple(_dot(act(x + s(4)) + s(5), wf) for x, wf in zip(out, w3f))
    scale = scalars[7].astype(dt)
    return tuple(o * scale + s(6) + x for o, x in zip(out, stack))


def apply_causal_stack(
    stack: Stack,
    stacked_params,
    cond_embedded: Optional[jax.Array],
    *,
    kernel_size: int,
    dropout_prob: float,
    train: bool,
    rng: Optional[jax.Array],
    remat: bool = False,
    folded_io: bool = False,
) -> Stack:
    """Run N mask-'B' causal blocks (leaf-stacked params) in block space.

    stack: 3 x (B, s0, s1, s2, C) streams; cond_embedded: (B, s0, s1, s2, Cc)
    or None. One fold at entry, one scan over blocks, one unfold at exit.
    ``folded_io=True``: streams and condition arrive ALREADY folded and the
    result stays folded (the model runs its whole interior in block space).
    """
    n_blocks = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    folded = jax.vmap(
        lambda p: fold_causal_block_params(p, kernel_size)
    )(stacked_params)
    pads2 = folded_causal_pads(kernel_size)

    dt = stack[0].dtype
    if folded_io:
        xs_f = stack
        cond_f = (
            cond_embedded.astype(dt) if cond_embedded is not None else None
        )
    else:
        xs_f = tuple(space_to_depth(x, 2) for x in stack)
        cond_f = (
            space_to_depth(cond_embedded.astype(dt), 2)
            if cond_embedded is not None
            else None
        )

    use_dropout = dropout_prob > 0 and train

    # Stack-resident causal megakernel (ops/causal_kernel.py): the whole
    # mask-'B' segment in ONE pallas_call, streams VMEM-resident. Single
    # real-TPU device only (under GSPMD an opaque pallas_call would force
    # gathers of the sharded volume). Channel-dropout (torch Dropout3d —
    # per-(sample, channel) masks only) streams into the kernel as data:
    # the masks are drawn OUTSIDE with the exact fold_in/split/bernoulli
    # sequence of the scan path, so both paths sample identical networks.
    if jax.default_backend() == "tpu" and jax.device_count() == 1:
        from vqvae3d_tpu.ops.causal_kernel import (
            causal_fused_ok,
            causal_stack_fused,
            pack_causal_union,
        )

        cb8 = jax.tree_util.tree_leaves(folded)[0].shape[-1]
        c8c = cond_f.shape[-1] if cond_f is not None else 0
        if causal_fused_ok(
            xs_f[0].shape, dt, cb8, c8c, kernel_size=kernel_size
        ):
            weights = jax.vmap(pack_causal_union)(folded)
            has_cond = cond_f is not None
            cf = (
                cond_f
                if has_cond
                else jnp.zeros((xs_f[0].shape[0], 1, 1, 1, 8), dt)
            )
            xu = jnp.concatenate(xs_f, axis=-1)
            b = xu.shape[0]
            if use_dropout:
                assert rng is not None
                mask = union_dropout_masks(
                    rng, n_blocks, b, cb8, dropout_prob
                )
                p_static = float(dropout_prob)
            else:
                mask = jnp.zeros((n_blocks, b, 1), jnp.float32)
                p_static = 0.0
            yu = causal_stack_fused(
                (has_cond, p_static, False), xu, cf, mask, *weights
            )
            c8 = xs_f[0].shape[-1]
            ys = tuple(
                yu[..., s * c8 : (s + 1) * c8] for s in range(3)
            )
            if folded_io:
                return ys
            return tuple(depth_to_space(y, 2) for y in ys)
    if use_dropout:
        assert rng is not None
        rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(n_blocks)
        )
        xs = (folded, rngs)
    else:
        xs = (folded, jnp.zeros((n_blocks,), jnp.int32))

    def body(carry, x):
        p, r = x
        out = causal_preact_block_folded(
            carry,
            p,
            cond_f,
            pads2=pads2,
            dropout_prob=dropout_prob,
            train=train,
            rng=r if use_dropout else None,
        )
        return out, None

    if remat:
        body = jax.checkpoint(body)
    ys, _ = jax.lax.scan(body, xs_f, xs)
    if folded_io:
        return ys
    return tuple(depth_to_space(y, 2) for y in ys)
