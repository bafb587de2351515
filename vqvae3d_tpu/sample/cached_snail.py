"""Cached incremental ancestral sampling for PixelSNAIL (KV-cached attention).

Extends the three-phase cached PixelCNN sampler (cached_sample.py) through
CausalAttentionPixelBlock (VERDICT r1 #3; reference sampling loop to beat:
/root/reference/pixel_model/pixelsnail.py:219-298, O(V²) full forwards with
a recompile per prefix). Key observations that make the phase decomposition
survive attention:

  * Stream closure holds THROUGH attention. Depth-stream activations at
    slice i0 are functions of x[slices < i0] only (the mask-'A' shift in
    to_causal), so once slice i0−1 is sampled, a full-grid depth pass —
    including full causal attention over the flattened raster — yields
    exact depth-stream values for every position of slice i0.
    Height-stream values at row (i0, i1) are functions of x[< i0] ∪
    x[i0, < i1]; width-stream values at a voxel are final at that voxel.
  * Attention keys/values therefore become FINAL per stream at different
    granularities: depth K/V are recomputed per slice (full grid, masked),
    height K/V are committed once per completed slice, width K/V appended
    once per sampled voxel — the per-stream KV caches.

Attention role convention (mirrors models/causal_blocks.py:676-691, which
mirrors the reference's swapped call): the query vector at position t comes
from the keys-half of key_value_proj(stack, out, background); the attended
(key-side) vectors come from query_proj(out, background); values from the
values-half of key_value_proj.

Cost (r4, incremental default): every conv layer's work is O(V) TOTAL
across the whole sampling run — each voxel's depth/height/width stream
values are computed exactly once, from per-layer causal-tap caches
(depth: post-2b v at the previous slice, _depth_slice_step; height: the
previous k-2 rows, _height_row_step) — plus O(V²·dh) attention MACs
(inherent to attention sampling; K/V are append-only, never recomputed).
VQVAE3D_SNAIL_INC=0 restores the r3 recompute formulation (s0 full-grid
depth passes + s0·s1 slice-local height passes + a per-slice commit).
The two are equality-tested against each other and against the one-shot
forward (tests/test_cached_snail.py).

Supports PreActFixupCausalResBlock blocks with or without conditioning —
the published PixelSNAIL jobs are unconditional (train_pixelsnail_*.job:
--use-conditioning False).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vqvae3d_tpu.models.prior_utils import generate_background, idx_to_one_hot
from vqvae3d_tpu.ops.resize import trilinear_resize
from vqvae3d_tpu.sample.cached_sample import (
    ELU,
    _conv_causal_nd,
    _LayerParams,
    _mm,
    _shift_front,
)


class _SnailBlock:
    """Param view over one CausalAttentionPixelBlock subtree."""

    def __init__(self, p, num_layers_per_block: int, has_cond: bool):
        self.causal = [
            _LayerParams(p[f"causal_{j}"], has_cond, is_first=False)
            for j in range(num_layers_per_block)
        ]
        self.kv = p["key_value_proj"]
        self.q = p["query_proj"]
        self.out_proj = _LayerParams(p["out_proj"], has_cond, is_first=False)
        self.aux = p["out_proj"]["aux"]


def _proj(x, conv_p, stream: str):
    """1x1x1 CausalConv3dAdd component for one stream (mask 'B', k=1 —
    plain pointwise conv, causal_blocks.CausalConv3dAdd with w_size=1)."""
    c = conv_p[f"{stream}_conv"]
    return _mm(x, c["kernel"]) + c["bias"].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Attention helpers (fp32, explicit raster-order masks)
# ---------------------------------------------------------------------------


def _attend(q, K, V, nh: int, q_idx, k_valid_upto):
    """q: (B, nq, br) queries; K/V: (B, S, br); q_idx: (nq,) flat raster
    indices of the queries; k_valid_upto: per-query max attended flat index
    (inclusive) — normally q_idx itself (tril incl. diagonal).

    Returns (B, nq, br) attention outputs.
    """
    b, nq, br = q.shape
    s = K.shape[1]
    dh = br // nh
    qh = (q * dh**-0.5).reshape(b, nq, nh, dh)
    kh = K.reshape(b, s, nh, dh)
    vh = V.reshape(b, s, nh, dh)
    from vqvae3d_tpu.sample.cached_sample import sample_precision

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, precision=sample_precision()
    ).astype(jnp.float32)
    k_idx = jnp.arange(s)
    mask = k_idx[None, :] <= k_valid_upto[:, None]  # (nq, S)
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", w, vh, precision=sample_precision()
    ).reshape(b, nq, br)


def _attend_grid_chunked(q_grid, K, V, nh: int, chunk: int):
    """Full-grid causal self-attention over the flattened raster, queries
    processed in chunks so the (V, V) score matrix never materializes.

    q_grid/K/V: (B, V, br) in raster order. Chunk must divide V.
    """
    b, v, br = q_grid.shape
    n_chunks = v // chunk
    qc = q_grid.reshape(b, n_chunks, chunk, br).transpose(1, 0, 2, 3)

    def one(args):
        i, qi = args
        q_idx = i * chunk + jnp.arange(chunk)
        return _attend(qi, K, V, nh, q_idx, q_idx)

    outs = jax.lax.map(one, (jnp.arange(n_chunks), qc))
    return outs.transpose(1, 0, 2, 3).reshape(b, v, br)


# ---------------------------------------------------------------------------
# Per-layer stream updates (cached forms of PreActFixupCausalResBlock)
# ---------------------------------------------------------------------------


def _depth_layer(lp: _LayerParams, d, cond, aux, half):
    """Full-grid depth-stream update. d: (B,s0,s1,s2,C). Returns
    (d_new, d2h, d2w) with d2h/d2w the ExpandRF injections (pre-aux)."""
    u = ELU(d + lp.s["1a"]) + lp.s["1b"]
    if lp.is_first:
        u = _shift_front(u, 1)
    t = _mm(u, lp.c1["depth_conv"]["kernel"])
    erf = _mm(t, lp.erf_d["kernel"]) + lp.erf_d["bias"].astype(jnp.float32)
    d2h, d2w = jnp.split(erf, 2, axis=-1)
    if aux is not None:
        t = t + _proj(ELU(aux), lp.aux_p, "depth")
    v = ELU(t + lp.s["2a"]) + lp.s["2b"]
    b2 = _conv_causal_nd(v, lp.c2["depth_conv"]["kernel"], causal_axes=(0,), half=half)
    if cond is not None:
        b2 = b2 + cond
    w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
    out = _mm(w3, lp.c3["depth_conv"]["kernel"]) * lp.scale + lp.s["4"]
    if lp.skip is not None:
        sk_in = _shift_front(d, 1) if lp.is_first else d
        sk = _proj(sk_in, lp.skip_p, "depth")
        return out + sk, d2h, d2w
    return out + d, d2h, d2w


def _height_layer(lp: _LayerParams, h, d2h, cond, aux, half):
    """Slice-local height-stream update. h: (B,s1,s2,C); d2h: (B,s1,s2,br).
    Returns (h_new, h2w)."""
    u = ELU(h + lp.s["1a"]) + lp.s["1b"]
    if lp.is_first:
        u = _shift_front(u, 1)
    t_pre = _mm(u, lp.c1["height_conv"]["kernel"])
    h2w = _mm(t_pre, lp.erf_h["kernel"]) + lp.erf_h["bias"].astype(jnp.float32)
    t = t_pre + d2h
    if aux is not None:
        t = t + _proj(ELU(aux), lp.aux_p, "height")
    v = ELU(t + lp.s["2a"]) + lp.s["2b"]
    kern = lp.c2["height_conv"]["kernel"][0]  # (k-1, k, Cin, Cout)
    b2 = _conv_causal_nd(v, kern, causal_axes=(0,), half=half)
    if cond is not None:
        b2 = b2 + cond
    w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
    out = _mm(w3, lp.c3["height_conv"]["kernel"]) * lp.scale + lp.s["4"]
    if lp.skip is not None:
        sk_in = _shift_front(h, 1) if lp.is_first else h
        sk = _proj(sk_in, lp.skip_p, "height")
        return out + sk, h2w
    return out + h, h2w


def _width_layer(lp: _LayerParams, w_vec, w_prev_raw, d2w_vec, h2w_vec, cond_vec,
                 aux_vec, v_cache, first_col=False):
    """One-voxel width-stream update. w_vec: (B, C) current width value;
    v_cache: (B, ws-1, br) previous post-2b branch taps; first_col: (traced
    bool) i2 == 0 — the model's mask-'A' shift pads the POST-activation u
    with literal 0 at the first column, so layer-0's u is zeroed there.
    Returns (w_new, new_cache)."""
    if lp.is_first:
        u = ELU(w_prev_raw + lp.s["1a"]) + lp.s["1b"]
        u = jnp.where(first_col, jnp.zeros_like(u), u)
    else:
        u = ELU(w_vec + lp.s["1a"]) + lp.s["1b"]
    t = _mm(u, lp.c1["width_conv"]["kernel"])
    t = t + d2w_vec + h2w_vec
    if aux_vec is not None:
        t = t + _proj(ELU(aux_vec), lp.aux_p, "width")
    v = ELU(t + lp.s["2a"]) + lp.s["2b"]
    wk = lp.c2["width_conv"]["kernel"]  # (1, 1, ws, br, br)
    ws = wk.shape[2]
    taps = jnp.concatenate([v_cache, v[:, None, :]], axis=1)
    b2 = jnp.einsum(
        "bsi,sio->bo", taps, wk[0, 0].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    new_cache = taps[:, 1:, :] if ws > 1 else v_cache
    if cond_vec is not None:
        b2 = b2 + cond_vec
    w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
    out = _mm(w3, lp.c3["width_conv"]["kernel"]) * lp.scale + lp.s["4"]
    if lp.skip is not None:
        sk_in = w_prev_raw if lp.is_first else w_vec
        sk = _proj(sk_in, lp.skip_p, "width")
        return out + sk, new_cache
    return out + w_vec, new_cache


# _LayerParams extensions for the SNAIL blocks (aux conv + skip as dict)
def _augment_layer(lp: _LayerParams, p):
    lp.aux_p = p.get("aux")
    lp.skip_p = p.get("skip_conv")
    return lp


def _make_layer(p, has_cond, is_first):
    lp = _LayerParams(p, has_cond, is_first)
    return _augment_layer(lp, p)


# ---------------------------------------------------------------------------
# Program extraction
# ---------------------------------------------------------------------------


class _Program(NamedTuple):
    to_causal: object
    blocks: List[_SnailBlock]
    w_in: jax.Array
    b_in: jax.Array
    w_out: jax.Array
    b_out: jax.Array
    nh: int
    branch: int
    half: int

    @property
    def all_layers(self):
        """Flat list of causal layers in forward order (for conditioning)."""
        out = [self.to_causal]
        for blk in self.blocks:
            out.extend(blk.causal)
            out.append(blk.out_proj)
        return out


def _extract_program(model, params) -> _Program:
    cfg = model.config
    has_cond = cfg.use_conditioning
    to_causal = _make_layer(params["to_causal"], has_cond, is_first=True)
    blocks = []
    for i in range(cfg.num_blocks):
        p = params[f"block_{i}"]
        blk = _SnailBlock(p, cfg.num_layers_per_block, has_cond)
        for lp, lpp in zip(blk.causal, [p[f"causal_{j}"] for j in range(cfg.num_layers_per_block)]):
            _augment_layer(lp, lpp)
        _augment_layer(blk.out_proj, p["out_proj"])
        blocks.append(blk)
    branch = cfg.model_dim // cfg.bottleneck_divisor
    return _Program(
        to_causal=to_causal,
        blocks=blocks,
        w_in=params["parse_input"]["kernel"],
        b_in=params["parse_input"]["bias"].astype(jnp.float32),
        w_out=params["parse_output"]["kernel"],
        b_out=params["parse_output"]["bias"].astype(jnp.float32),
        nh=cfg.num_heads,
        branch=branch,
        half=cfg.kernel_size // 2,
    )


# ---------------------------------------------------------------------------
# Phase A: full-grid depth pass (convs + full causal attention per block)
# ---------------------------------------------------------------------------


def _depth_layer_slice(lp, d_sl, cond_sl, aux_sl, sprev_emb, i0, vprev, half):
    """One depth layer restricted to slice i0 (incremental form of
    _depth_layer): the s0-causal conv taps come from the cached previous
    slice's post-2b value ``vprev`` and the current ``v``; the mask-'A'
    shift reads the previous slice's parse_input embedding. Returns
    (d_new_sl, d2h_sl, d2w_sl, v)."""
    if lp.is_first:
        u = ELU(sprev_emb + lp.s["1a"]) + lp.s["1b"]
        u = jnp.where(i0 > 0, u, jnp.zeros_like(u))
    else:
        u = ELU(d_sl + lp.s["1a"]) + lp.s["1b"]
    t = _mm(u, lp.c1["depth_conv"]["kernel"])
    erf = _mm(t, lp.erf_d["kernel"]) + lp.erf_d["bias"].astype(jnp.float32)
    d2h, d2w = jnp.split(erf, 2, axis=-1)
    if aux_sl is not None:
        t = t + _proj(ELU(aux_sl), lp.aux_p, "depth")
    v = ELU(t + lp.s["2a"]) + lp.s["2b"]
    wk = lp.c2["depth_conv"]["kernel"]  # (k-1, k, k, br, br)
    b2 = _conv_causal_nd(vprev, wk[0], causal_axes=(), half=half)
    b2 = b2 + _conv_causal_nd(v, wk[1], causal_axes=(), half=half)
    if cond_sl is not None:
        b2 = b2 + cond_sl
    w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
    out = _mm(w3, lp.c3["depth_conv"]["kernel"]) * lp.scale + lp.s["4"]
    if lp.skip is not None:
        sk_in = (
            jnp.where(i0 > 0, sprev_emb, jnp.zeros_like(sprev_emb))
            if lp.is_first
            else d_sl
        )
        sk = _proj(sk_in, lp.skip_p, "depth")
        return out + sk, d2h, d2w, v
    return out + d_sl, d2h, d2w, v


def _depth_slice_step(
    prog: _Program, sprev_emb, i0, bg_sl, cond_slices, dvc, kd, vd
):
    """Incremental depth phase: slice i0's depth-stream outputs from
    per-layer conv caches (``dvc``: post-2b v at slice i0-1) and
    append-only attention K/V (``kd``/``vd``; depth values and K/V at
    slice i0 are FINAL once slice i0-1 is sampled, so nothing is ever
    recomputed). Equals indexing the full-grid _depth_phase at slice i0
    (tested via the cached-vs-naive and forced-logits suites).

    sprev_emb: parse_input(x[:, i0-1]) (zeros at i0=0), (B, s1, s2, C).
    Returns (d2h_sl list, d2w_sl list, d_fin_sl, dvc', kd', vd').
    """
    b, s1, s2, _ = sprev_emb.shape
    slice_v = s1 * s2
    half = prog.half
    d = jnp.broadcast_to(prog.b_in, (b, s1, s2, prog.b_in.shape[-1]))

    def cond_at(i):
        return cond_slices[i] if cond_slices is not None else None

    ci = 0
    new_dvc = list(dvc)
    new_kd = list(kd)
    new_vd = list(vd)
    d2h_all, d2w_all = [], []

    d, d2h, d2w, new_dvc[ci] = _depth_layer_slice(
        prog.to_causal, d, cond_at(ci), None, sprev_emb, i0, dvc[ci], half
    )
    d2h_all.append(d2h)
    d2w_all.append(d2w)
    ci += 1

    for bi, blk in enumerate(prog.blocks):
        stack_d = d
        out_d = d
        for lp in blk.causal:
            out_d, d2h, d2w, new_dvc[ci] = _depth_layer_slice(
                lp, out_d, cond_at(ci), None, sprev_emb, i0, dvc[ci], half
            )
            d2h_all.append(d2h)
            d2w_all.append(d2w)
            ci += 1
        kv_in = jnp.concatenate([stack_d, out_d, bg_sl], axis=-1)
        kv = _proj(kv_in, blk.kv, "depth")
        q_side = kv[..., : prog.branch].reshape(b, slice_v, prog.branch)
        vals = kv[..., prog.branch :].reshape(b, slice_v, prog.branch)
        q_in = jnp.concatenate([out_d, bg_sl], axis=-1)
        k_side = _proj(q_in, blk.q, "depth").reshape(b, slice_v, prog.branch)
        K = jax.lax.dynamic_update_slice(kd[bi], k_side, (0, i0 * slice_v, 0))
        V = jax.lax.dynamic_update_slice(vd[bi], vals, (0, i0 * slice_v, 0))
        new_kd[bi] = K
        new_vd[bi] = V
        q_idx = i0 * slice_v + jnp.arange(slice_v)
        attn = _attend(q_side, K, V, prog.nh, q_idx, q_idx)
        attn = attn.reshape(b, s1, s2, prog.branch)
        out_d, d2h, d2w, new_dvc[ci] = _depth_layer_slice(
            blk.out_proj, out_d, cond_at(ci), attn, sprev_emb, i0, dvc[ci],
            half,
        )
        d2h_all.append(d2h)
        d2w_all.append(d2w)
        ci += 1
        d = out_d
    return d2h_all, d2w_all, d, new_dvc, new_kd, new_vd


def _depth_phase(prog: _Program, s_full, bg, cond_layers):
    """s_full: parse_input(x) (B,s0,s1,s2,C) fp32; bg: (B,s0,s1,s2,3).

    Returns (d2h_all, d2w_all, d_final) where d2h/d2w are flat per-causal-
    layer full-grid caches (ordering = prog.all_layers).
    """
    b, s0, s1, s2, _ = s_full.shape
    v_total = s0 * s1 * s2
    chunk = s1 * s2
    ci = 0  # index into cond_layers / all_layers ordering
    d = s_full
    d2h_all, d2w_all = [], []

    def cond_at(i):
        return cond_layers[i] if cond_layers is not None else None

    d, d2h, d2w = _depth_layer(prog.to_causal, d, cond_at(ci), None, prog.half)
    d2h_all.append(d2h)
    d2w_all.append(d2w)
    ci += 1

    for blk in prog.blocks:
        stack_d = d
        out_d = d
        for lp in blk.causal:
            out_d, d2h, d2w = _depth_layer(lp, out_d, cond_at(ci), None, prog.half)
            d2h_all.append(d2h)
            d2w_all.append(d2w)
            ci += 1
        # attention (depth stream): Q from kv-keys, K from q_proj, V from
        # kv-values (the reference's swapped-role convention)
        kv_in = jnp.concatenate([stack_d, out_d, bg], axis=-1)
        kv = _proj(kv_in, blk.kv, "depth")
        q_side = kv[..., : prog.branch].reshape(b, v_total, prog.branch)
        vals = kv[..., prog.branch :].reshape(b, v_total, prog.branch)
        q_in = jnp.concatenate([out_d, bg], axis=-1)
        k_side = _proj(q_in, blk.q, "depth").reshape(b, v_total, prog.branch)
        attn = _attend_grid_chunked(q_side, k_side, vals, prog.nh, chunk)
        attn = attn.reshape(b, s0, s1, s2, prog.branch)
        out_d, d2h, d2w = _depth_layer(
            blk.out_proj, out_d, cond_at(ci), attn, prog.half
        )
        d2h_all.append(d2h)
        d2w_all.append(d2w)
        ci += 1
        d = out_d
    return d2h_all, d2w_all, d


# ---------------------------------------------------------------------------
# Phase B (incremental): row-restricted height pass with per-layer
# causal-tap caches and append-only K/V (r4 — the same decomposition that
# took the PixelCNN top level 126 s -> 20 s, applied at row granularity).
#
# Why it is exact: every height-stream value at row i1 is a function of
# x[slices < i0] ∪ x[i0, rows < i1] only (the mask-'A' shift in to_causal
# moves the raw embedding down one row; all later height convs are
# front-padded causal over s1), so once row i1−1 is sampled, row i1's
# height values — and therefore its attention keys/values — are FINAL.
# The full-slice height pass recomputed per row (30.3 ms/row at the mid
# config, PERF.md) only ever used its row-i1 restriction; the commit
# pass at end-of-slice recomputed K/V the per-row appends now write
# directly (same math: K at row j depends on rows < j, all sampled when
# row j's pass runs). Equality is pinned by tests/test_cached_snail.py
# (forced-teacher logits vs the one-shot forward, both sampler drivers).
# ---------------------------------------------------------------------------


def _height_layer_row(lp: _LayerParams, h_row, d2h_row, cond_row, aux_row,
                      rprev_emb, i1, hv_prev, half):
    """One height layer restricted to row i1 (incremental form of
    _height_layer). h_row: (B, s2, C) stream value at row i1; rprev_emb:
    parse_input(x[i0, i1-1]) (zeros at i1=0); hv_prev: (B, k-2, s2, br)
    cached post-2b branch values at rows i1-(k-2)..i1-1.

    Returns (h_new_row, h2w_row, hv_new) — hv_new is the rolled tap
    window (B, k-2, s2, br): the next row's cache entry."""
    if lp.is_first:
        u = ELU(rprev_emb + lp.s["1a"]) + lp.s["1b"]
        u = jnp.where(i1 > 0, u, jnp.zeros_like(u))
    else:
        u = ELU(h_row + lp.s["1a"]) + lp.s["1b"]
    t_pre = _mm(u, lp.c1["height_conv"]["kernel"])
    h2w = _mm(t_pre, lp.erf_h["kernel"]) + lp.erf_h["bias"].astype(jnp.float32)
    t = t_pre + d2h_row
    if aux_row is not None:
        t = t + _proj(ELU(aux_row), lp.aux_p, "height")
    v = ELU(t + lp.s["2a"]) + lp.s["2b"]
    kern = lp.c2["height_conv"]["kernel"][0]  # (k-1, k, br, br)
    taps = jnp.concatenate([hv_prev, v[:, None]], axis=1)  # (B, k-1, s2, br)
    b2 = _conv_causal_nd(taps[:, 0], kern[0], causal_axes=(), half=half)
    for ti in range(1, kern.shape[0]):
        b2 = b2 + _conv_causal_nd(
            taps[:, ti], kern[ti], causal_axes=(), half=half
        )
    hv_new = taps[:, 1:]
    if cond_row is not None:
        b2 = b2 + cond_row
    w3 = ELU(b2 + lp.s["3a"]) + lp.s["3b"]
    out = _mm(w3, lp.c3["height_conv"]["kernel"]) * lp.scale + lp.s["4"]
    if lp.skip is not None:
        sk_in = (
            jnp.where(i1 > 0, rprev_emb, jnp.zeros_like(rprev_emb))
            if lp.is_first
            else h_row
        )
        sk = _proj(sk_in, lp.skip_p, "height")
        return out + sk, h2w, hv_new
    return out + h_row, h2w, hv_new


def _height_row_step(prog: _Program, rprev_emb, i1, row_off, bg_row,
                     cond_rows, d2h_rows, hvc, kh, vh):
    """Incremental height phase: row i1's height-stream outputs from the
    per-layer conv caches (``hvc``) and append-only height K/V
    (``kh``/``vh``, written at flat offset ``row_off`` — final at row
    start since they depend only on rows < i1). Equals indexing the
    full-slice _height_phase at row i1.

    rprev_emb: parse_input(x[i0, i1-1]) (zeros at i1=0), (B, s2, C);
    d2h_rows: flat per-layer (B, s2, br) depth injections at row i1.
    Returns (h2w_rows, h_fin_row, hvc', kh', vh').
    """
    b, s2, _ = rprev_emb.shape
    h = jnp.broadcast_to(prog.b_in, (b, s2, prog.b_in.shape[-1]))
    ci = 0
    new_hvc = list(hvc)
    new_kh = list(kh)
    new_vh = list(vh)
    h2w_all = []

    def cond_at(i):
        return cond_rows[i] if cond_rows is not None else None

    h, h2w, new_hvc[ci] = _height_layer_row(
        prog.to_causal, h, d2h_rows[ci], cond_at(ci), None, rprev_emb, i1,
        hvc[ci], prog.half,
    )
    h2w_all.append(h2w)
    ci += 1

    for bi, blk in enumerate(prog.blocks):
        stack_h = h
        out_h = h
        for lp in blk.causal:
            out_h, h2w, new_hvc[ci] = _height_layer_row(
                lp, out_h, d2h_rows[ci], cond_at(ci), None, rprev_emb, i1,
                hvc[ci], prog.half,
            )
            h2w_all.append(h2w)
            ci += 1
        kv_in = jnp.concatenate([stack_h, out_h, bg_row], axis=-1)
        kv = _proj(kv_in, blk.kv, "height")
        q_side = kv[..., : prog.branch]  # (B, s2, br)
        vals = kv[..., prog.branch :]
        q_in = jnp.concatenate([out_h, bg_row], axis=-1)
        k_side = _proj(q_in, blk.q, "height")
        K = jax.lax.dynamic_update_slice(kh[bi], k_side, (0, row_off, 0))
        V = jax.lax.dynamic_update_slice(vh[bi], vals, (0, row_off, 0))
        new_kh[bi] = K
        new_vh[bi] = V
        q_idx = row_off + jnp.arange(s2)
        attn = _attend(q_side, K, V, prog.nh, q_idx, q_idx)
        out_h, h2w, new_hvc[ci] = _height_layer_row(
            blk.out_proj, out_h, d2h_rows[ci], cond_at(ci), attn, rprev_emb,
            i1, hvc[ci], prog.half,
        )
        h2w_all.append(h2w)
        ci += 1
        h = out_h
    return h2w_all, h, new_hvc, new_kh, new_vh


# ---------------------------------------------------------------------------
# Phase B: slice-local height pass with committed KV caches
# ---------------------------------------------------------------------------


def _height_phase(prog: _Program, s_slice, bg_slice, i0, d2h_slices, cond_slices,
                  kh_caches, vh_caches):
    """One height pass over slice i0.

    s_slice: parse_input(x)[:, i0] (B,s1,s2,C); d2h_slices: flat per-layer
    (B,s1,s2,br) injections; kh_caches/vh_caches: per-block (B,V,br)
    committed height K/V (valid strictly below slice i0).

    Returns (h2w_all [flat per layer], h_final_slice,
             k_slice_per_block, v_slice_per_block) — the latter two are this
    slice's height K/V (valid rows ≤ current sampling row; used by the
    caller both for in-slice attention and for the per-slice commit).
    """
    b, s1, s2, _ = s_slice.shape
    slice_v = s1 * s2
    ci = 0
    h = s_slice
    h2w_all = []
    k_out, v_out = [], []

    def cond_at(i):
        return cond_slices[i] if cond_slices is not None else None

    h, h2w = _height_layer(
        prog.to_causal, h, d2h_slices[ci], cond_at(ci), None, prog.half
    )
    h2w_all.append(h2w)
    ci += 1

    for bi, blk in enumerate(prog.blocks):
        stack_h = h
        out_h = h
        for lp in blk.causal:
            out_h, h2w = _height_layer(
                lp, out_h, d2h_slices[ci], cond_at(ci), None, prog.half
            )
            h2w_all.append(h2w)
            ci += 1
        kv_in = jnp.concatenate([stack_h, out_h, bg_slice], axis=-1)
        kv = _proj(kv_in, blk.kv, "height")
        q_side = kv[..., : prog.branch].reshape(b, slice_v, prog.branch)
        vals = kv[..., prog.branch :].reshape(b, slice_v, prog.branch)
        q_in = jnp.concatenate([out_h, bg_slice], axis=-1)
        k_side = _proj(q_in, blk.q, "height").reshape(b, slice_v, prog.branch)
        k_out.append(k_side)
        v_out.append(vals)

        # keys = committed prefix (slices < i0) ∪ this slice (causal within)
        K = jax.lax.dynamic_update_slice(
            kh_caches[bi], k_side, (0, i0 * slice_v, 0)
        )
        V = jax.lax.dynamic_update_slice(
            vh_caches[bi], vals, (0, i0 * slice_v, 0)
        )
        q_idx = i0 * slice_v + jnp.arange(slice_v)
        attn = _attend(q_side, K, V, prog.nh, q_idx, q_idx)
        attn = attn.reshape(b, s1, s2, prog.branch)
        out_h, h2w = _height_layer(
            blk.out_proj, out_h, d2h_slices[ci], cond_at(ci), attn, prog.half
        )
        h2w_all.append(h2w)
        ci += 1
        h = out_h
    return h2w_all, h, k_out, v_out


# ---------------------------------------------------------------------------
# Phase C: per-voxel width step with appended KV caches
# ---------------------------------------------------------------------------


def _width_phase_step(prog: _Program, s_vec, s_prev, bg_vec, flat_idx,
                      d2w_vecs, h2w_vecs, cond_vecs, v_caches,
                      kw_caches, vw_caches, first_col=False):
    """One voxel of the width chain through all blocks.

    s_vec/s_prev: parse_input at t / t−1 (B, C); bg_vec: (B, 3);
    flat_idx: scalar raster index of t; v_caches: flat per-layer conv tap
    caches; kw/vw_caches: per-block (B, V, br) width K/V (valid < t).

    Returns (w_final, new_v_caches, new_kw, new_vw).
    """
    b = s_vec.shape[0]
    ci = 0
    li = 0  # v_cache index (same flat ordering)
    w = s_vec
    new_vc = list(v_caches)
    new_kw = list(kw_caches)
    new_vw = list(vw_caches)

    def cond_at(i):
        return cond_vecs[i] if cond_vecs is not None else None

    w, new_vc[li] = _width_layer(
        prog.to_causal, w, s_prev, d2w_vecs[ci], h2w_vecs[ci], cond_at(ci),
        None, v_caches[li], first_col=first_col,
    )
    ci += 1
    li += 1

    for bi, blk in enumerate(prog.blocks):
        stack_w = w
        out_w = w
        for lp in blk.causal:
            out_w, new_vc[li] = _width_layer(
                lp, out_w, s_prev, d2w_vecs[ci], h2w_vecs[ci], cond_at(ci),
                None, v_caches[li],
            )
            ci += 1
            li += 1
        kv_in = jnp.concatenate([stack_w, out_w, bg_vec], axis=-1)  # (B, ·)
        kv = _proj(kv_in, blk.kv, "width")
        q_side = kv[..., : prog.branch][:, None, :]  # (B, 1, br)
        val = kv[..., prog.branch :]
        q_in = jnp.concatenate([out_w, bg_vec], axis=-1)
        k_side = _proj(q_in, blk.q, "width")
        K = jax.lax.dynamic_update_slice(
            new_kw[bi], k_side[:, None, :], (0, flat_idx, 0)
        )
        V = jax.lax.dynamic_update_slice(
            new_vw[bi], val[:, None, :], (0, flat_idx, 0)
        )
        new_kw[bi] = K
        new_vw[bi] = V
        attn = _attend(
            q_side, K, V, prog.nh, flat_idx[None], flat_idx[None]
        )[:, 0]  # (B, br)
        out_w, new_vc[li] = _width_layer(
            blk.out_proj, out_w, s_prev, d2w_vecs[ci], h2w_vecs[ci],
            cond_at(ci), attn, v_caches[li],
        )
        ci += 1
        li += 1
        w = out_w
    return w, new_vc, new_kw, new_vw


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
    forced_x: Optional[jax.Array] = None,
):
    """Prepare program/caches and return ``(slice_body, carry0)`` where
    ``slice_body(i0, (x, rng, kh, vh, kw, vw, logits_acc))`` samples slice
    i0. Shared by the fori_loop driver and the host-sliced driver (one
    execution per slice — see cached_sample._build_slice_body for why)."""
    cfg = model.config
    k = cfg.input_dim
    s0, s1, s2 = dims
    b = batch_size
    slice_v = s1 * s2
    v_total = s0 * slice_v
    n_layers = cfg.num_blocks * (cfg.num_layers_per_block + 1) + 1
    has_cond = cfg.use_conditioning

    prog = _extract_program(model, params)
    bg = generate_background(b, dims).astype(jnp.float32)

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
            for lp in prog.all_layers
        ]

    def parse_in(x_oh):
        return _mm(x_oh, prog.w_in) + prog.b_in

    x0 = jnp.zeros((b, s0, s1, s2, k), jnp.float32)
    br = prog.branch
    nb = cfg.num_blocks

    kh0 = [jnp.zeros((b, v_total, br), jnp.float32) for _ in range(nb)]
    vh0 = [jnp.zeros((b, v_total, br), jnp.float32) for _ in range(nb)]
    kw0 = [jnp.zeros((b, v_total, br), jnp.float32) for _ in range(nb)]
    vw0 = [jnp.zeros((b, v_total, br), jnp.float32) for _ in range(nb)]
    logits0 = jnp.zeros((b, s0, s1, s2, k), jnp.float32)

    # Incremental depth + height phases (default on; VQVAE3D_SNAIL_INC=0
    # restores the full-grid/full-slice recompute path): per-layer causal
    # conv-tap caches + attention K/V appended per slice (depth) / per
    # row (height). When disabled, the carries hold (1,)-dummies so the
    # fallback mode doesn't pay the cache memory (~1.3 GB at mid size).
    import os as _os

    incremental = _os.environ.get("VQVAE3D_SNAIL_INC", "1") == "1"
    _dummy = jnp.zeros((1,), jnp.float32)
    if incremental:
        dvc0 = [
            jnp.zeros((b, s1, s2, br), jnp.float32) for _ in range(n_layers)
        ]
        kd0 = [jnp.zeros((b, v_total, br), jnp.float32) for _ in range(nb)]
        vd0 = [jnp.zeros((b, v_total, br), jnp.float32) for _ in range(nb)]
    else:
        dvc0 = [_dummy for _ in range(n_layers)]
        kd0 = [_dummy for _ in range(nb)]
        vd0 = [_dummy for _ in range(nb)]

    forced = forced_x is not None
    forced_oh = (
        jax.nn.one_hot(forced_x, k, dtype=jnp.float32) if forced else None
    )

    def slice_body(i0, carry):
        x, rng, kh, vh, kw, vw, logits_acc, dvc, kd, vd = carry
        take = lambda a: jax.lax.dynamic_index_in_dim(a, i0, 1, False)
        bg_sl = take(bg)
        cond_sl = [take(c) for c in cond_layers] if has_cond else None
        if incremental:
            # incremental depth phase: slice i0 only, from the per-layer
            # conv caches + append-only attention K/V — replaces a full
            # 41-layer grid tower + 8 full-grid attentions per slice
            # (measured ~45% of mid-level sampling time, PERF.md)
            xp = jax.lax.dynamic_index_in_dim(
                x, jnp.maximum(i0 - 1, 0), 1, False
            )
            sprev_emb = jnp.where(i0 > 0, parse_in(xp), 0.0)
            d2h_sl, d2w_sl, d_fin_sl, dvc, kd, vd = _depth_slice_step(
                prog, sprev_emb, i0, bg_sl, cond_sl, dvc, kd, vd
            )
        else:
            s_full = parse_in(x)
            d2h_full, d2w_full, d_fin_full = _depth_phase(
                prog, s_full, bg, cond_layers
            )
            d2h_sl = [take(a) for a in d2h_full]
            d2w_sl = [take(a) for a in d2w_full]
            d_fin_sl = take(d_fin_full)

        def row_inner(i1, h2w_row, h_fin_row, x, rng, kw, vw, logits_acc):
            """Voxel loop over row i1 (shared by both row drivers)."""
            taker = lambda a: jax.lax.dynamic_index_in_dim(a, i1, 1, False)
            d2w_row = [taker(a) for a in d2w_sl]
            d_fin_row = taker(d_fin_sl)
            bg_row = taker(bg_sl)
            cond_row = [taker(c) for c in cond_sl] if has_cond else None

            all_lps = prog.all_layers
            v_caches0 = [
                jnp.zeros(
                    (b, lp.c2["width_conv"]["kernel"].shape[2] - 1,
                     lp.c2["width_conv"]["kernel"].shape[-1]),
                    jnp.float32,
                )
                for lp in all_lps
            ]
            s_prev0 = jnp.zeros((b, prog.b_in.shape[-1]), jnp.float32)

            def voxel_body(i2, carry):
                x, rng, v_caches, s_prev, kw, vw, logits_acc = carry
                x_vec = jax.lax.dynamic_slice(
                    x, (0, i0, i1, i2, 0), (b, 1, 1, 1, k)
                ).reshape(b, k)
                s_vec = parse_in(x_vec)
                tk = lambda a: jax.lax.dynamic_index_in_dim(a, i2, 1, False)
                d2w_vec = [tk(a) for a in d2w_row]
                h2w_vec = [tk(a) for a in h2w_row]
                cond_vec = [tk(c) for c in cond_row] if has_cond else None
                bg_vec = tk(bg_row)
                flat_idx = i0 * slice_v + i1 * s2 + i2

                w_fin, v_caches, kw, vw = _width_phase_step(
                    prog, s_vec, s_prev, bg_vec, flat_idx,
                    d2w_vec, h2w_vec, cond_vec, v_caches, kw, vw,
                    first_col=(i2 == 0),
                )
                total = tk(d_fin_row) + tk(h_fin_row) + w_fin
                logits = _mm(total, prog.w_out) + prog.b_out
                rng, sub = jax.random.split(rng)
                if forced:
                    one_hot = jax.lax.dynamic_slice(
                        forced_oh, (0, i0, i1, i2, 0), (b, 1, 1, 1, k)
                    ).reshape(b, k)
                    logits_acc = jax.lax.dynamic_update_slice(
                        logits_acc, logits.reshape(b, 1, 1, 1, k),
                        (0, i0, i1, i2, 0),
                    )
                else:
                    sampled = jax.random.categorical(sub, logits / tau, axis=-1)
                    one_hot = jax.nn.one_hot(sampled, k, dtype=jnp.float32)
                x = jax.lax.dynamic_update_slice(
                    x, one_hot.reshape(b, 1, 1, 1, k), (0, i0, i1, i2, 0)
                )
                s_prev_new = parse_in(one_hot)
                return (x, rng, v_caches, s_prev_new, kw, vw, logits_acc)

            x, rng, _, _, kw, vw, logits_acc = jax.lax.fori_loop(
                0, s2, voxel_body,
                (x, rng, v_caches0, s_prev0, kw, vw, logits_acc),
            )
            return x, rng, kw, vw, logits_acc

        if incremental:
            # incremental height phase: row i1 only, from per-layer
            # conv-tap caches (hvc: post-2b v at the previous k-2 rows)
            # + per-row appended height K/V — replaces a full-slice
            # 41-layer tower + attention pass per row (measured
            # 30.3 ms/row x ~1056 rows ≈ half of mid-level sampling,
            # PERF.md). The end-of-slice commit pass disappears: row
            # K/V are final at row start and already appended.
            hvc0 = [
                jnp.zeros(
                    (b, lp.c2["height_conv"]["kernel"].shape[1] - 1, s2,
                     lp.c2["height_conv"]["kernel"].shape[-2]),
                    jnp.float32,
                )
                for lp in prog.all_layers
            ]

            def row_body(i1, carry):
                x, rng, kw, vw, logits_acc, hvc, kh, vh = carry
                xp_row = jax.lax.dynamic_slice(
                    x, (0, i0, jnp.maximum(i1 - 1, 0), 0, 0),
                    (b, 1, 1, s2, k),
                ).reshape(b, s2, k)
                rprev_emb = jnp.where(i1 > 0, parse_in(xp_row), 0.0)
                row_off = i0 * slice_v + i1 * s2
                taker = lambda a: jax.lax.dynamic_index_in_dim(a, i1, 1, False)
                d2h_row = [taker(a) for a in d2h_sl]
                bg_row = taker(bg_sl)
                cond_row = [taker(c) for c in cond_sl] if has_cond else None
                h2w_row, h_fin_row, hvc, kh, vh = _height_row_step(
                    prog, rprev_emb, i1, row_off, bg_row, cond_row,
                    d2h_row, hvc, kh, vh,
                )
                x, rng, kw, vw, logits_acc = row_inner(
                    i1, h2w_row, h_fin_row, x, rng, kw, vw, logits_acc
                )
                return (x, rng, kw, vw, logits_acc, hvc, kh, vh)

            x, rng, kw, vw, logits_acc, _, kh, vh = jax.lax.fori_loop(
                0, s1, row_body,
                (x, rng, kw, vw, logits_acc, hvc0, kh, vh),
            )
            return (x, rng, kh, vh, kw, vw, logits_acc, dvc, kd, vd)

        def row_body(i1, carry):
            x, rng, kw, vw, logits_acc = carry
            x_sl = jax.lax.dynamic_index_in_dim(x, i0, 1, False)
            s_sl = parse_in(x_sl)
            h2w_sl, h_fin_sl, _, _ = _height_phase(
                prog, s_sl, bg_sl, i0, d2h_sl, cond_sl, kh, vh
            )
            taker = lambda a: jax.lax.dynamic_index_in_dim(a, i1, 1, False)
            h2w_row = [taker(a) for a in h2w_sl]
            h_fin_row = taker(h_fin_sl)
            x, rng, kw, vw, logits_acc = row_inner(
                i1, h2w_row, h_fin_row, x, rng, kw, vw, logits_acc
            )
            return (x, rng, kw, vw, logits_acc)

        x, rng, kw, vw, logits_acc = jax.lax.fori_loop(
            0, s1, row_body, (x, rng, kw, vw, logits_acc)
        )

        # commit: height K/V of the now-complete slice i0
        x_sl = jax.lax.dynamic_index_in_dim(x, i0, 1, False)
        s_sl = parse_in(x_sl)
        _, _, k_sl, v_sl = _height_phase(
            prog, s_sl, bg_sl, i0, d2h_sl, cond_sl, kh, vh
        )
        kh = [
            jax.lax.dynamic_update_slice(c, ks, (0, i0 * slice_v, 0))
            for c, ks in zip(kh, k_sl)
        ]
        vh = [
            jax.lax.dynamic_update_slice(c, vs, (0, i0 * slice_v, 0))
            for c, vs in zip(vh, v_sl)
        ]
        return (x, rng, kh, vh, kw, vw, logits_acc, dvc, kd, vd)

    return slice_body, (x0, kh0, vh0, kw0, vw0, logits0, dvc0, kd0, vd0)


def cached_snail_sample(
    model,
    params,
    rng: jax.Array,
    dims: Tuple[int, int, int],
    batch_size: int,
    condition_idx: Optional[jax.Array] = None,
    tau: float = 1.0,
    forced_x: Optional[jax.Array] = None,
):
    """Sample (B, *dims) int32 code grids from a PixelSNAIL prior.

    ``forced_x``: if given ((B, *dims) int32), don't sample — force these
    values and return the per-voxel logits instead (exactness testing
    against the model's one-shot forward).
    """
    slice_body, (x0, kh0, vh0, kw0, vw0, logits0, dvc0, kd0, vd0) = (
        _build_slice_body(
            model, params, dims, batch_size, condition_idx, tau, forced_x
        )
    )
    x, _, _, _, _, _, logits_acc, _, _, _ = jax.lax.fori_loop(
        0, dims[0], slice_body,
        (x0, rng, kh0, vh0, kw0, vw0, logits0, dvc0, kd0, vd0),
    )
    if forced_x is not None:
        return logits_acc
    return jnp.argmax(x, axis=-1).astype(jnp.int32)


# One execution per slice above this total-voxel count (same rationale and
# exactness as cached_sample._HOST_SLICES_ABOVE; the snail's per-voxel
# attention makes its executions far longer per voxel, so the threshold
# is lower). Override with VQVAE3D_SNAIL_HOST_SLICES_ABOVE (runtime-
# shaped, not model-shaped — see README "Runtime quirks").
_HOST_SLICES_ABOVE = 2048


def make_cached_snail_sampler(
    model,
    dims: Tuple[int, int, int],
    batch_size: int,
    tau: float = 1.0,
    host_slices: Optional[bool] = None,
):
    """Cached PixelSNAIL sampler (same signature as the PixelCNN cached
    sampler). ``host_slices`` defaults to on for grids above
    VQVAE3D_SNAIL_HOST_SLICES_ABOVE voxels (default 2048): the same
    slice_body runs as one device execution per slice, chained by its
    carry."""
    if host_slices is None:
        from vqvae3d_tpu.sample.cached_sample import _host_slices_threshold

        host_slices = dims[0] * dims[1] * dims[2] > _host_slices_threshold(
            "VQVAE3D_SNAIL_HOST_SLICES_ABOVE", _HOST_SLICES_ABOVE
        )
    has_cond = model.config.use_conditioning

    if not host_slices:
        if has_cond:

            @jax.jit
            def sampler(params, rng, condition_idx):
                return cached_snail_sample(
                    model, params, rng, dims, batch_size, condition_idx, tau
                )

        else:

            @jax.jit
            def sampler(params, rng):
                return cached_snail_sample(
                    model, params, rng, dims, batch_size, None, tau
                )

        return sampler

    # chunk k slices per device execution (same slice_body under a
    # fori_loop — identical carry chain; see cached_sample._slices_per_exec)
    from vqvae3d_tpu.sample.cached_sample import _slices_per_exec

    chunk = _slices_per_exec(dims[0], "VQVAE3D_SNAIL_SLICES_PER_EXEC", 8)

    def _step(params, condition_idx, i0, carry):
        slice_body, _ = _build_slice_body(
            model, params, dims, batch_size, condition_idx, tau
        )
        return jax.lax.fori_loop(i0, i0 + chunk, slice_body, carry)

    step = jax.jit(_step, donate_argnums=(3,))

    @jax.jit
    def _init(params, condition_idx):
        _, carry0 = _build_slice_body(
            model, params, dims, batch_size, condition_idx, tau
        )
        return carry0

    @jax.jit
    def _finish(x):
        return jnp.argmax(x, axis=-1).astype(jnp.int32)

    def run(params, rng, condition_idx=None):
        x0, kh0, vh0, kw0, vw0, logits0, dvc0, kd0, vd0 = _init(
            params, condition_idx
        )
        # copy the key: the donated carry would otherwise delete the
        # caller's buffer (callers legitimately reuse their key object)
        carry = (
            x0, jnp.array(rng, copy=True), kh0, vh0, kw0, vw0, logits0,
            dvc0, kd0, vd0,
        )
        for i0 in range(0, dims[0], chunk):
            carry = step(params, condition_idx, jnp.int32(i0), carry)
        return _finish(carry[0])

    if has_cond:
        return lambda params, rng, condition_idx: run(
            params, rng, condition_idx
        )
    return lambda params, rng: run(params, rng, None)
