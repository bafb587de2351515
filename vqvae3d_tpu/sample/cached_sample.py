"""Cached incremental ancestral sampling for PixelCNN — exact, O(V^{4/3}).

The naive sampler (ar_sample.py) runs a full-grid forward per voxel:
O(V) forwards of O(V) cost = O(V²) — the same asymptotics as the reference
(pixel_model/pixelcnn.py:260-283; the reference additionally caches only the
condition projections, :289-295). This module exploits the conical
cross-stream dependency of the causal 3-stack (depth → height → width,
models/causal_blocks.py) to decompose sampling into three cached phases:

  * SLICE phase — the depth-stream tower is a closed sub-network over
    completed s0-slices: one pass per slice yields every layer's
    depth→height / depth→width ExpandRF injections (d2h_l, d2w_l) and the
    final depth-stream output for the whole slice.
  * ROW phase — given d2h_l, the height-stream towers restricted to the
    current slice form an exact 2-D causal network (all height convs have
    kernel depth 1): one pass per row yields h2w_l and the final
    height-stream output for the row.
  * VOXEL phase — the width-stream chain is a per-voxel scan of 1×1×1
    contractions + a ws-tap width conv, fed by the cached d2w/h2w.

With the r4 incremental depth tower (_depth_tower_slice — per-layer
causal-tap caches so slice i0's depth pass is O(slice), not O(grid);
VQVAE3D_CNN_INC=0 restores the recompute form) total conv work is O(V):
every stream value is computed exactly once across the whole sampling
run — vs the reference's O(V²) — with bit-identical results
(tests/test_cached_sample.py verifies equality against the naive
sampler, k=3 and k=5, and incremental vs recompute).

Supports PixelCNN with PreActFixupCausalResBlock (the configuration used by
every reference prior job; see SURVEY §6) with or without conditioning.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqvae3d_tpu.models.prior_utils import idx_to_one_hot
from vqvae3d_tpu.ops.resize import trilinear_resize

ELU = jax.nn.elu


def sample_precision():
    """Matmul precision for the sampling path. Default = the backend's
    fast precision (bf16 MXU rounding on TPU) — the REFERENCE samples
    under torch.cuda.amp fp16 autocast (sample_embeddings.py:137), so
    fast is the faithful mode and ~2x quicker. VQVAE3D_SAMPLE_EXACT=1
    pins fp32-exact math (used by the exactness tests; measured +86%% on
    top-level sampling)."""
    import os

    if os.environ.get("VQVAE3D_SAMPLE_EXACT", "0") == "1":
        return jax.lax.Precision.HIGHEST
    return None


def _mm(x, w1x1):
    """(..., Cin) @ 1x1x1 kernel (1,1,1,Cin,Cout) → (..., Cout), fp32."""
    return jnp.einsum(
        "...i,io->...o", x, w1x1[0, 0, 0].astype(jnp.float32),
        precision=sample_precision(),
    )


def _shift_front(x, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis])
    return jnp.pad(x, pad)[tuple(sl)]


def _conv_causal_nd(x, w, causal_axes, half):
    """VALID conv with causal (front) padding on ``causal_axes`` and
    symmetric ``half`` padding on the rest. x: (B, *spatial, C); w: full
    kernel (*k, Cin, Cout)."""
    nsp = x.ndim - 2
    k = w.shape[:nsp]
    pad = []
    for ax in range(nsp):
        if ax in causal_axes:
            pad.append((k[ax] - 1, 0))
        else:
            pad.append((half, half))
    dn_in = "N" + "DHW"[3 - nsp :][:nsp] + "C"
    dn_k = "DHW"[3 - nsp :][:nsp] + "IO"
    full_pad = [(0, 0)] + pad + [(0, 0)]
    x = jnp.pad(x, full_pad)
    return jax.lax.conv_general_dilated(
        x,
        w.astype(jnp.float32),
        window_strides=(1,) * nsp,
        padding="VALID",
        dimension_numbers=(dn_in, dn_k, dn_in),
        preferred_element_type=jnp.float32,
        precision=sample_precision(),
    )


class _LayerParams:
    """View over one PreActFixupCausalResBlock's param subtree."""

    def __init__(self, p, has_cond: bool, is_first: bool):
        self.s = {n: p[f"bias{n}"][0].astype(jnp.float32)
                  for n in ("1a", "1b", "2a", "2b", "3a", "3b", "4")}
        self.scale = p["scale"][0].astype(jnp.float32)
        self.c1 = p["branch_conv1"]
        self.c2 = p["branch_conv2"]
        self.c3 = p["branch_conv3"]
        self.erf_d = p["expand_rf"]["depth_conv"]
        self.erf_h = p["expand_rf"]["height_conv"]
        self.cond = p.get("condition") if has_cond else None
        self.skip = p.get("skip_conv")
        self.is_first = is_first


def _extract_layers(params, num_layers: int, has_cond: bool):
    return [
        _LayerParams(params[f"layer_{i}"], has_cond, i == 0)
        for i in range(num_layers)
    ]


# ---------------------------------------------------------------------------
# Phase A: depth tower over the full grid
# ---------------------------------------------------------------------------

def _depth_tower(layers, s_in, cond_layers, half):
    """s_in: parse_input(x) (B, s0, s1, s2, C) fp32. Returns
    (d2h [L], d2w [L], d_final) — the per-layer ExpandRF injections and the
    final depth stream, all full-grid."""
    d = s_in
    d2h_all, d2w_all = [], []
    for li, lp in enumerate(layers):
        u = ELU(d + lp.s["1a"]) + lp.s["1b"]
        if lp.is_first:
            u = _shift_front(u, 1)  # mask-'A' backwards shift on s0
        t = _mm(u, lp.c1["depth_conv"]["kernel"])  # (…, br)
        erf = _mm(t, lp.erf_d["kernel"]) + lp.erf_d["bias"].astype(jnp.float32)
        d2h, d2w = jnp.split(erf, 2, axis=-1)
        d2h_all.append(d2h)
        d2w_all.append(d2w)

        v = ELU(t + lp.s["2a"]) + lp.s["2b"]
        b2 = _conv_causal_nd(v, lp.c2["depth_conv"]["kernel"], causal_axes=(0,), half=half)
        if cond_layers is not None:
            b2 = b2 + cond_layers[li]
        w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
        out = _mm(w3, lp.c3["depth_conv"]["kernel"]) * lp.scale + lp.s["4"]
        if lp.skip is not None:
            sk_in = _shift_front(d, 1) if lp.is_first else d
            sk = _mm(sk_in, lp.skip["depth_conv"]["kernel"]) + lp.skip[
                "depth_conv"
            ]["bias"].astype(jnp.float32)
            d = out + sk
        else:
            d = out + d
    return d2h_all, d2w_all, d


def _depth_tower_slice(layers, b_in, sprev_emb, i0, cond_sl, dvc, half):
    """Incremental depth tower: slice i0's outputs from per-layer causal-
    tap caches — the r4 counterpart of cached_snail._depth_slice_step for
    the attention-free PixelCNN (kills the per-slice full-grid recompute,
    measured 51.2 ms x 128 slices = 6.6 s of the 20.2 s top-level sample,
    PERF.md).

    Why it is exact: depth-stream values at slice i0 are functions of
    x[slices < i0] only (the mask-'A' shift + front-padded causal depth
    convs), so once slice i0-1 is sampled they are final, and the only
    cross-slice carriers are (a) the previous slice's raw embedding (the
    mask-'A' shift/skip input) and (b) each layer's post-2b branch value
    at the previous k-2 slices (the causal conv taps) — ``dvc``.

    sprev_emb: parse_in(x[:, i0-1]) zeroed at i0=0, (B, s1, s2, C).
    dvc: per-layer (B, k-2, s1, s2, br).
    Returns (d2h_sl [L], d2w_sl [L], d_fin_sl, dvc')."""
    b, s1, s2, _ = sprev_emb.shape
    d = jnp.broadcast_to(b_in, (b, s1, s2, b_in.shape[-1]))
    d2h_all, d2w_all = [], []
    new_dvc = list(dvc)
    for li, lp in enumerate(layers):
        if lp.is_first:
            u = ELU(sprev_emb + lp.s["1a"]) + lp.s["1b"]
            u = jnp.where(i0 > 0, u, jnp.zeros_like(u))
        else:
            u = ELU(d + lp.s["1a"]) + lp.s["1b"]
        t = _mm(u, lp.c1["depth_conv"]["kernel"])
        erf = _mm(t, lp.erf_d["kernel"]) + lp.erf_d["bias"].astype(jnp.float32)
        d2h, d2w = jnp.split(erf, 2, axis=-1)
        d2h_all.append(d2h)
        d2w_all.append(d2w)

        v = ELU(t + lp.s["2a"]) + lp.s["2b"]
        wk = lp.c2["depth_conv"]["kernel"]  # (k-1, k, k, br, br)
        taps = jnp.concatenate([dvc[li], v[:, None]], axis=1)  # (B,k-1,s1,s2,br)
        b2 = _conv_causal_nd(taps[:, 0], wk[0], causal_axes=(), half=half)
        for ti in range(1, wk.shape[0]):
            b2 = b2 + _conv_causal_nd(
                taps[:, ti], wk[ti], causal_axes=(), half=half
            )
        new_dvc[li] = taps[:, 1:]
        if cond_sl is not None:
            b2 = b2 + cond_sl[li]
        w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
        out = _mm(w3, lp.c3["depth_conv"]["kernel"]) * lp.scale + lp.s["4"]
        if lp.skip is not None:
            sk_in = (
                jnp.where(i0 > 0, sprev_emb, jnp.zeros_like(sprev_emb))
                if lp.is_first
                else d
            )
            sk = _mm(sk_in, lp.skip["depth_conv"]["kernel"]) + lp.skip[
                "depth_conv"
            ]["bias"].astype(jnp.float32)
            d = out + sk
        else:
            d = out + d
    return d2h_all, d2w_all, d, new_dvc


# ---------------------------------------------------------------------------
# Phase B: height tower over one slice
# ---------------------------------------------------------------------------

def _height_tower(layers, s_slice, d2h_slice, cond_slice, half):
    """s_slice: parse_input(x)[:, i0] (B, s1, s2, C). d2h_slice: list of
    (B, s1, s2, br). Returns (h2w [L], h_final) for the slice."""
    h = s_slice
    h2w_all = []
    for li, lp in enumerate(layers):
        u = ELU(h + lp.s["1a"]) + lp.s["1b"]
        if lp.is_first:
            u = _shift_front(u, 1)  # 'A' down-shift on s1
        t_pre = _mm(u, lp.c1["height_conv"]["kernel"])
        # ExpandRF computes h2w from the height branch BEFORE the d2h add
        # (causal_blocks.ExpandRFConv: h2w = conv(height); height += d2h)
        h2w = _mm(t_pre, lp.erf_h["kernel"]) + lp.erf_h["bias"].astype(jnp.float32)
        h2w_all.append(h2w)
        t = t_pre + d2h_slice[li]

        v = ELU(t + lp.s["2a"]) + lp.s["2b"]
        # height conv kernel (1, k-1, k) → 2-D (k-1, k) causal on s1
        kern = lp.c2["height_conv"]["kernel"][0]
        b2 = _conv_causal_nd(v, kern, causal_axes=(0,), half=half)
        if cond_slice is not None:
            b2 = b2 + cond_slice[li]
        w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
        out = _mm(w3, lp.c3["height_conv"]["kernel"]) * lp.scale + lp.s["4"]
        if lp.skip is not None:
            sk_in = _shift_front(h, 1) if lp.is_first else h
            sk = _mm(sk_in, lp.skip["height_conv"]["kernel"]) + lp.skip[
                "height_conv"
            ]["bias"].astype(jnp.float32)
            h = out + sk
        else:
            h = out + h
    return h2w_all, h


# ---------------------------------------------------------------------------
# Phase C: per-voxel width chain
# ---------------------------------------------------------------------------

def _width_step(layers, s_vec, s_prev_vec, d2w_vec, h2w_vec, cond_vec, v_caches,
                first_col=False):
    """One voxel of the width chain.

    s_vec / s_prev_vec: parse_input embedding at i2 / i2−1 (B, C).
    d2w_vec/h2w_vec: per-layer cached injections at this voxel (B, br).
    v_caches: per-layer (B, ws−1, br) previous post-act branch values.
    first_col: (traced bool) i2 == 0 — the mask-'A' right-shift pads the
    POST-activation value with literal 0 at the first column
    (causal_blocks.shift_right_3d on u), so layer-0's u must be zeroed
    there, not ELU(0+bias1a)+bias1b.
    Returns (w_final (B, C), new_v_caches).
    """
    w = s_vec
    w_prev_raw = s_prev_vec  # raw stack value at i2−1 (for layer-0 shifts)
    new_caches = []
    for li, lp in enumerate(layers):
        if lp.is_first:
            u = ELU(w_prev_raw + lp.s["1a"]) + lp.s["1b"]  # 'A' right-shift
            u = jnp.where(first_col, jnp.zeros_like(u), u)
        else:
            u = ELU(w + lp.s["1a"]) + lp.s["1b"]
        t = _mm(u, lp.c1["width_conv"]["kernel"])
        t = t + d2w_vec[li] + h2w_vec[li]

        v = ELU(t + lp.s["2a"]) + lp.s["2b"]  # (B, br)
        wk = lp.c2["width_conv"]["kernel"]  # (1, 1, ws, br, br)
        ws = wk.shape[2]
        taps = jnp.concatenate([v_caches[li], v[:, None, :]], axis=1)  # (B, ws, br)
        b2 = jnp.einsum(
            "bsi,sio->bo", taps, wk[0, 0].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        new_caches.append(taps[:, 1:, :] if ws > 1 else v_caches[li])
        if cond_vec is not None:
            b2 = b2 + cond_vec[li]
        w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
        out = _mm(w3, lp.c3["width_conv"]["kernel"]) * lp.scale + lp.s["4"]
        if lp.skip is not None:
            sk_in = w_prev_raw if lp.is_first else w
            sk = _mm(sk_in, lp.skip["width_conv"]["kernel"]) + lp.skip[
                "width_conv"
            ]["bias"].astype(jnp.float32)
            w = out + sk
        else:
            w = out + w
    return w, new_caches


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _build_slice_body(
    model,
    params,
    dims: Tuple[int, int, int],
    batch_size: int,
    condition_idx: Optional[jax.Array] = None,
    tau: float = 1.0,
    row_kernel=None,
):
    """Prepare caches/params and return ``(slice_body, x0)`` where
    ``slice_body(i0, (x, rng)) -> (x, rng)`` samples slice i0. Used by the
    single-execution fori_loop driver (cached_ancestral_sample) and the
    host-sliced driver (make_cached_sampler(host_slices=True)) — the
    latter exists because the tunneled TPU runtime kills single
    executions longer than ~1 min, and a full-grid sampling program at
    the published top size (128x128x32 = 524k sequential voxel steps,
    slurm-jobs/sample_embeddings_top.job:68) runs for minutes.

    ``row_kernel``: run the voxel phase as ONE Pallas call per row
    (ops/decode_row.py — same draws via the precomputed Gumbel table).
    None = auto (on on a single real TPU, both drivers); "interpret"
    for CPU tests."""
    import os

    cfg = model.config
    if row_kernel is None:
        row_kernel = (
            os.environ.get("VQVAE3D_ROW_KERNEL", "1") == "1"
            and jax.default_backend() == "tpu"
            and jax.device_count() == 1
            and cfg.kernel_size == 3
        )
    if row_kernel:
        # the in-kernel height step hardcodes the k=3 tap geometry (the
        # only kernel size the reference ships)
        assert cfg.kernel_size == 3, "row_kernel requires kernel_size=3"
    assert cfg.use_pre_activation and not cfg.use_concat_activation, (
        "cached sampling supports the PreActFixupCausalResBlock PixelCNN"
    )
    k = cfg.input_dim
    s0, s1, s2 = dims
    b = batch_size
    half = cfg.kernel_size // 2
    n_layers = cfg.num_resblocks + 1
    has_cond = cfg.use_conditioning

    layers = _extract_layers(params, n_layers, has_cond)
    w_in = params["parse_input"]["kernel"]
    b_in = params["parse_input"]["bias"].astype(jnp.float32)
    w_out = params["parse_output"]["kernel"]
    b_out = params["parse_output"]["bias"].astype(jnp.float32)

    # Condition contributions are pointwise per layer — precompute once
    # (a strictly stronger version of the reference's condition cache,
    # pixelcnn.py:289-295).
    cond_layers = None
    if has_cond:
        assert condition_idx is not None
        cond_oh = idx_to_one_hot(condition_idx, cfg.condition_dim)
        cond_up = trilinear_resize(cond_oh, dims).astype(jnp.float32)
        cond_emb = _mm(cond_up, params["embed_condition"]["kernel"]) + params[
            "embed_condition"
        ]["bias"].astype(jnp.float32)
        cond_layers = [
            _mm(cond_emb, lp.cond["kernel"]) + lp.cond["bias"].astype(jnp.float32)
            for lp in layers
        ]

    def parse_in(x_oh):
        return _mm(x_oh, w_in) + b_in

    _stacked_cache = {}

    def _stacked():
        if "w" not in _stacked_cache:
            from vqvae3d_tpu.ops.decode_row import stack_row_weights

            _stacked_cache["w"] = stack_row_weights(
                layers, w_in, b_in, w_out, b_out
            )
        return _stacked_cache["w"]

    x0 = jnp.zeros((b, s0, s1, s2, k), jnp.float32)

    # Incremental depth tower (default on; VQVAE3D_CNN_INC=0 restores the
    # full-grid recompute): per-layer causal-tap caches make slice i0's
    # depth pass O(slice) instead of O(grid) — see _depth_tower_slice.
    incremental = os.environ.get("VQVAE3D_CNN_INC", "1") == "1"
    if incremental:
        dvc0 = [
            jnp.zeros(
                (b, lp.c2["depth_conv"]["kernel"].shape[0] - 1, s1, s2,
                 lp.c2["depth_conv"]["kernel"].shape[-2]),
                jnp.float32,
            )
            for lp in layers
        ]
    else:
        dvc0 = [jnp.zeros((1,), jnp.float32) for _ in layers]

    def slice_body(i0, carry):
        x, rng, dvc = carry
        cond_sl = (
            [jax.lax.dynamic_index_in_dim(c, i0, 1, False) for c in cond_layers]
            if has_cond
            else None
        )
        if incremental:
            xp = jax.lax.dynamic_index_in_dim(
                x, jnp.maximum(i0 - 1, 0), 1, False
            )
            sprev_emb = jnp.where(i0 > 0, parse_in(xp), 0.0)
            d2h_sl, d2w_sl, d_fin_sl, dvc = _depth_tower_slice(
                layers, b_in, sprev_emb, i0, cond_sl, dvc, half
            )
        else:
            s_full = parse_in(x)
            d2h_full, d2w_full, d_fin_full = _depth_tower(
                layers, s_full, cond_layers, half
            )
            # slice-local caches
            d2h_sl = [
                jax.lax.dynamic_index_in_dim(a, i0, 1, False) for a in d2h_full
            ]
            d2w_sl = [
                jax.lax.dynamic_index_in_dim(a, i0, 1, False) for a in d2w_full
            ]
            d_fin_sl = jax.lax.dynamic_index_in_dim(d_fin_full, i0, 1, False)
        if row_kernel:
            # one Pallas call per row (ops/decode_row.py): the in-kernel
            # height-row step replaces the XLA height tower entirely; its
            # per-layer v-row caches thread through the row loop
            from vqvae3d_tpu.ops.decode_row import gumbel_row, row_decode

            d2h_stk = jnp.stack(d2h_sl)  # (L, B, s1, s2, br)
            d2w_stk = jnp.stack(d2w_sl)
            cond_stk = jnp.stack(cond_sl) if has_cond else None
            br = d2w_stk.shape[-1]
            n_layers_ = d2w_stk.shape[0]
            vhc0 = jnp.zeros((n_layers_, b, s2, br), jnp.float32)

            def row_body_k(i1, carry):
                x, rng, vhc = carry
                x_sl = jax.lax.dynamic_index_in_dim(x, i0, 1, False)
                prev_row = jax.lax.dynamic_index_in_dim(
                    x_sl, jnp.maximum(i1 - 1, 0), 1, False
                )  # (B, s2, K)
                s_prev_row = jnp.where(i1 > 0, parse_in(prev_row), 0.0)
                rng, gum = gumbel_row(rng, b, s2, k)
                samples, vhc = row_decode(
                    _stacked(),
                    jax.lax.dynamic_index_in_dim(d2h_stk, i1, 2, False),
                    jax.lax.dynamic_index_in_dim(d2w_stk, i1, 2, False),
                    jax.lax.dynamic_index_in_dim(cond_stk, i1, 2, False)
                    if has_cond
                    else None,
                    jax.lax.dynamic_index_in_dim(d_fin_sl, i1, 1, False),
                    s_prev_row,
                    vhc,
                    gum,
                    i1,
                    tau,
                    interpret=(row_kernel == "interpret"),
                )  # (B, s2) int32
                one_hots = jax.nn.one_hot(samples, k, dtype=jnp.float32)
                x = jax.lax.dynamic_update_slice(
                    x, one_hots.reshape(b, 1, 1, s2, k), (0, i0, i1, 0, 0)
                )
                return (x, rng, vhc)

            x, rng, _ = jax.lax.fori_loop(
                0, s1, row_body_k, (x, rng, vhc0)
            )
            return (x, rng, dvc)

        def row_body(i1, carry):
            x, rng = carry
            x_sl = jax.lax.dynamic_index_in_dim(x, i0, 1, False)  # (B,s1,s2,K)
            s_sl = parse_in(x_sl)
            h2w_sl, h_fin_sl = _height_tower(layers, s_sl, d2h_sl, cond_sl, half)
            h_fin_row = jax.lax.dynamic_index_in_dim(h_fin_sl, i1, 1, False)
            d_fin_row = jax.lax.dynamic_index_in_dim(d_fin_sl, i1, 1, False)

            h2w_row = [
                jax.lax.dynamic_index_in_dim(a, i1, 1, False) for a in h2w_sl
            ]  # (B, s2, br)
            d2w_row = [
                jax.lax.dynamic_index_in_dim(a, i1, 1, False) for a in d2w_sl
            ]
            cond_row = (
                [jax.lax.dynamic_index_in_dim(c, i1, 1, False) for c in cond_sl]
                if has_cond
                else None
            )

            ws_list = [lp.c2["width_conv"]["kernel"].shape[2] for lp in layers]
            v_caches0 = [
                jnp.zeros((b, ws - 1, lp.c2["width_conv"]["kernel"].shape[-1]),
                          jnp.float32)
                for ws, lp in zip(ws_list, layers)
            ]
            s_prev0 = jnp.zeros((b, b_in.shape[-1]), jnp.float32)

            def voxel_body(i2, carry):
                x, rng, v_caches, s_prev = carry
                x_vec = jax.lax.dynamic_slice(
                    x, (0, i0, i1, i2, 0), (b, 1, 1, 1, k)
                ).reshape(b, k)
                s_vec = parse_in(x_vec)
                d2w_vec = [
                    jax.lax.dynamic_index_in_dim(a, i2, 1, False) for a in d2w_row
                ]
                h2w_vec = [
                    jax.lax.dynamic_index_in_dim(a, i2, 1, False) for a in h2w_row
                ]
                cond_vec = (
                    [jax.lax.dynamic_index_in_dim(c, i2, 1, False) for c in cond_row]
                    if has_cond
                    else None
                )
                w_fin, v_caches = _width_step(
                    layers, s_vec, s_prev, d2w_vec, h2w_vec, cond_vec, v_caches,
                    first_col=(i2 == 0),
                )
                total = (
                    jax.lax.dynamic_index_in_dim(d_fin_row, i2, 1, False)
                    + jax.lax.dynamic_index_in_dim(h_fin_row, i2, 1, False)
                    + w_fin
                )
                logits = _mm(total, w_out) + b_out  # (B, K)
                rng, sub = jax.random.split(rng)
                sampled = jax.random.categorical(sub, logits / tau, axis=-1)
                one_hot = jax.nn.one_hot(sampled, k, dtype=jnp.float32)
                x = jax.lax.dynamic_update_slice(
                    x, one_hot.reshape(b, 1, 1, 1, k), (0, i0, i1, i2, 0)
                )
                s_prev_new = parse_in(one_hot)
                return (x, rng, v_caches, s_prev_new)

            x, rng, _, _ = jax.lax.fori_loop(
                0, s2, voxel_body, (x, rng, v_caches0, s_prev0)
            )
            return (x, rng)

        x, rng = jax.lax.fori_loop(0, s1, row_body, (x, rng))
        return (x, rng, dvc)

    return slice_body, (x0, dvc0)


def cached_ancestral_sample(
    model,
    params,
    rng: jax.Array,
    dims: Tuple[int, int, int],
    batch_size: int,
    condition_idx: Optional[jax.Array] = None,
    tau: float = 1.0,
    row_kernel=False,
) -> jax.Array:
    slice_body, (x0, dvc0) = _build_slice_body(
        model, params, dims, batch_size, condition_idx, tau, row_kernel
    )
    x, _, _ = jax.lax.fori_loop(0, dims[0], slice_body, (x0, rng, dvc0))
    return jnp.argmax(x, axis=-1).astype(jnp.int32)


# Above this many voxels the sampler runs one EXECUTION PER SLICE from the
# host (identical math — the fori_loop merely moves to Python): bounds
# per-execution device time, which both keeps the remote-TPU execution
# watchdog happy (~1 min hard kill, measured) and streams progress.
# Configurable because the threshold is runtime-shaped, not model-shaped:
# on a standard libtpu runtime (no execution watchdog) a much larger
# value — or VQVAE3D_HOST_SLICES_ABOVE=0 to always host-slice, or a
# huge value to never — may be preferable (see README "Runtime quirks").
_HOST_SLICES_ABOVE = 8192


def _host_slices_threshold(env_name: str, default: int) -> int:
    import os

    return int(os.environ.get(env_name, str(default)))


def _slices_per_exec(s0: int, env_name: str, default: int) -> int:
    """Slices per device execution for the host-sliced drivers.

    r5 (VERDICT r4 #2): one dispatch PER SLICE paid ~host-RTT × s0 of
    non-device time (measured: tools/profile_sample.py — at the top grid
    ~69 ms/slice wall vs ~23 ms/slice device). Chunking k slices into one
    execution (a fori_loop over the same slice_body — identical math,
    identical carry chain) divides the dispatch count by k while keeping
    per-execution device time far below the tunneled runtime's ~60 s
    watchdog. Clamped to a divisor of s0 so every execution runs the same
    static trip count (one compiled executable)."""
    import os

    req = int(os.environ.get(env_name, str(default)))
    req = max(1, min(req, s0))
    while s0 % req:
        req -= 1
    return req


def make_cached_sampler(
    model,
    dims: Tuple[int, int, int],
    batch_size: int,
    tau: float = 1.0,
    host_slices: Optional[bool] = None,
    row_kernel=None,
):
    """Cached sampler with the same signature as
    ar_sample.make_ancestral_sampler. ``host_slices`` defaults to on for
    grids above VQVAE3D_HOST_SLICES_ABOVE voxels (default 8192;
    exactness: the host loop is the same slice_body chained by its
    carry — tested in tests/test_cached_sample.py). ``row_kernel``
    (None = auto on single real TPU) runs the voxel phase as one Pallas
    call per row."""
    if host_slices is None:
        host_slices = dims[0] * dims[1] * dims[2] > _host_slices_threshold(
            "VQVAE3D_HOST_SLICES_ABOVE", _HOST_SLICES_ABOVE
        )
    has_cond = model.config.use_conditioning

    if not host_slices:
        if has_cond:

            @jax.jit
            def sampler(params, rng, condition_idx):
                return cached_ancestral_sample(
                    model, params, rng, dims, batch_size, condition_idx,
                    tau, row_kernel,
                )

        else:

            @jax.jit
            def sampler(params, rng):
                return cached_ancestral_sample(
                    model, params, rng, dims, batch_size, None,
                    tau, row_kernel,
                )

        return sampler

    chunk = _slices_per_exec(dims[0], "VQVAE3D_SLICES_PER_EXEC", 16)

    def _step(params, condition_idx, i0, carry):
        slice_body, _ = _build_slice_body(
            model, params, dims, batch_size, condition_idx, tau, row_kernel
        )
        return jax.lax.fori_loop(i0, i0 + chunk, slice_body, carry)

    step = jax.jit(_step, donate_argnums=(3,))

    @jax.jit
    def _init(params, condition_idx):
        slice_body, carry0 = _build_slice_body(
            model, params, dims, batch_size, condition_idx, tau, False
        )
        del slice_body
        return carry0

    @jax.jit
    def _finish(x):
        return jnp.argmax(x, axis=-1).astype(jnp.int32)

    def run(params, rng, condition_idx=None):
        # copy the key: the donated carry would otherwise delete the
        # caller's buffer (callers legitimately reuse their key object)
        x0, dvc0 = _init(params, condition_idx)
        carry = (x0, jnp.array(rng, copy=True), dvc0)
        for i0 in range(0, dims[0], chunk):
            carry = step(params, condition_idx, jnp.int32(i0), carry)
        return _finish(carry[0])

    if has_cond:
        return lambda params, rng, condition_idx: run(
            params, rng, condition_idx
        )
    return lambda params, rng: run(params, rng, None)
