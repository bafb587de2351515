"""Hierarchical 3D VQ-VAE-2: encoder, decoder, and the combined model.

Re-designs /root/reference/vqvae/layers.py:390-588 (Encoder/Encoder2/Decoder)
and /root/reference/vqvae/model.py:33-246 (VQVAE LightningModule) as pure
flax modules — the training loop lives in vqvae3d_tpu.train.vqvae_train.

Hierarchy-level convention (critical, matches the reference):
  encode() returns levels ordered FINE → COARSE. Level 0 is the
  highest-resolution code grid; level n_enc-1 is the coarsest. The encoder
  computes deepest-first, threading each level's quantized output as
  top-down conditioning ('aux') into the next-finer level
  (reference layers.py:577-588).

TPU-first choices:
  * channels-last NDHWC; convs hit the MXU via implicit matmul over C.
  * bf16 compute / fp32 params via the ``dtype`` field; the quantizer is
    fp32-pinned internally.
  * optional rematerialization of the deep resblock stacks
    (``config.remat``) to fit 512×512×128 batches in HBM — replaces the
    reference's "fp16 + batch-1 barely fits 24GB" memory regime.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae3d_tpu.models.blocks import (
    RESBLOCKS,
    DownBlock,
    PreActParams,
    PreQuantizationConditioning,
    UpBlock,
    apply_same_stack,
)
from vqvae3d_tpu.models.quantizer import Quantizer
from vqvae3d_tpu.ops.conv3d import Conv3D
from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth


@dataclasses.dataclass(frozen=True)
class VQVAEConfig:
    """Hyperparameters, mirroring vqvae/model.py:213-246 argparse surface."""

    input_channels: int = 1
    output_channels: int = 1
    base_network_channels: int = 4
    n_bottleneck_blocks: int = 3  # number of hierarchy levels (n_enc)
    n_blocks_per_bottleneck: int = 2  # downscales per level (×4 spatial)
    n_pre_quantization_blocks: int = 0
    n_post_quantization_blocks: int = 0
    n_post_upscale_blocks: int = 0
    n_post_downscale_blocks: int = 0
    num_embeddings: Tuple[int, ...] = (256, 256, 256)  # fine → coarse
    block_type: str = "pre-activation"
    encoder_variant: str = "encoder2"  # 'encoder2' (default) | 'encoder' (legacy)
    commitment_cost: float = 0.1
    ema_decay: float = 0.99
    laplace_alpha: float = 1e-5
    # recon loss: 'huber' (the reference's shipped loss, model.py:162) or
    # 'mixture-nll' (discretized-logistic-mixture head; the reference parses
    # --n-mix and imports the machinery but never wires it, model.py:244)
    metric: str = "huber"
    n_mix: int = 2  # mixture components for metric='mixture-nll'
    base_lr: float = 1e-5
    extract_center_cylinder: bool = True
    dtype: Any = jnp.bfloat16
    remat: bool = True
    # Outer nn.remat around whole DownBlock/UpBlock wrappers. OFF by
    # default: with ``remat`` on, live activations are already bounded by
    # the inner per-block / per-scan-iteration checkpointing (and the stack
    # megakernel's own saves), so the outer wrapper only NESTS remat — its
    # backward re-runs the entire block forward once more before the scan's
    # per-iteration recompute even starts. Measured on v5e at the 512-res
    # full config: the decoder's non-kernel backward cost 190 ms against a
    # 41 ms forward (~4.8× recompute); dropping the outer wrapper trades
    # ~1 GB of saved block-boundary activations for that duplicate forward.
    # Set True for memory-tight configs (e.g. the literal C=4 stem).
    remat_blocks: bool = False
    argmin_method: str = "auto"
    # 'wrap' = reference-parity circular padding (vqvae/layers.py:109);
    # 'zeros' recommended for training from scratch at 512-res (avoids the
    # materialized circular-pad buffers whose small-channel layouts blow HBM
    # under autodiff)
    pad_mode: str = "wrap"
    # remat policy: None = flax default (save block inputs); 'nothing' =
    # nothing_saveable (recompute everything — removes the full-res
    # small-channel residuals whose padded layouts dominate HBM at 512-res)
    remat_policy: Any = None
    # TPU-native stem: space-to-depth the input by this factor before the
    # first conv (and depth-to-space after the last), replacing log2(factor)
    # of the first level's stride-2 halvings. With factor=2 and
    # base_network_channels=8 the code-grid hierarchy, embedding dims and
    # codebooks match the reference full model exactly while no
    # full-resolution tensor has fewer than factor³ channels — the fix for
    # 512-res single-chip training (XLA pads C<128 minor dims to 128-lane
    # tiles; C=4 at 512³ costs 64× HBM in remat copies). 1 = reference stem.
    stem_space_to_depth: int = 1
    # 'auto' = run small-channel 'same'-block stacks in the channel-packed
    # (B, C, D, H·W) layout (ops/packed_blocks.py — measured ~11× per-block
    # fwd+bwd on v5e for the emb-width pre-q stacks, identical math and
    # parameter tree); 'off' = always NDHWC.
    packed_stacks: str = "auto"
    # lax.scan structurally-identical 'same'-block stacks (pre-activation
    # block type): ONE traced block instead of N — compile time and op
    # overhead O(1) in stack depth. Identical math and parameter tree.
    scan_stacks: bool = True

    def __post_init__(self):
        assert self.block_type in RESBLOCKS
        assert self.encoder_variant in ("encoder2", "encoder")
        assert self.metric in ("huber", "mixture-nll"), self.metric
        assert self.packed_stacks in ("auto", "off"), self.packed_stacks
        f = self.stem_space_to_depth
        assert f >= 1 and (f & (f - 1)) == 0, "stem factor must be a power of 2"
        assert 2 ** self.stem_log2 <= 2**self.n_blocks_per_bottleneck, (
            "stem factor cannot exceed the first level's downscale"
        )
        assert len(self.num_embeddings) in (1, self.n_bottleneck_blocks)
        if len(self.num_embeddings) == 1:
            object.__setattr__(
                self,
                "num_embeddings",
                tuple(self.num_embeddings) * self.n_bottleneck_blocks,
            )
        else:
            object.__setattr__(self, "num_embeddings", tuple(self.num_embeddings))

    @property
    def n_enc(self) -> int:
        return self.n_bottleneck_blocks

    @property
    def head_channels(self) -> int:
        """Decoder out-conv channels: 3·n_mix per output channel for the
        mixture head (component logits, locs, log-scales), else
        output_channels."""
        if self.metric == "mixture-nll":
            return 3 * self.n_mix * self.output_channels
        return self.output_channels

    @property
    def stem_log2(self) -> int:
        return int(self.stem_space_to_depth).bit_length() - 1

    def level_n_down(self, i: int) -> int:
        """Stride-2 halvings inside level i's Down/UpBlock (the stem absorbs
        log2(stem_space_to_depth) of level 0's)."""
        nd = self.n_blocks_per_bottleneck
        return nd - self.stem_log2 if i == 0 else nd

    @property
    def level_channels(self) -> List[int]:
        """Feature channels after each level's DownBlock (fine → coarse)."""
        out, ch = [], self.base_network_channels
        for i in range(self.n_enc):
            ch = ch * 2 ** self.level_n_down(i)
            out.append(ch)
        return out

    @property
    def embedding_dims(self) -> List[int]:
        """Codebook embedding dim per level (fine → coarse): channels // 8."""
        for ch in self.level_channels:
            assert ch % 8 == 0
        return [ch // 8 for ch in self.level_channels]

    @property
    def downscale_factor(self) -> int:
        """Spatial reduction of the finest code grid w.r.t. the input."""
        return 2**self.n_blocks_per_bottleneck

    @property
    def num_layers(self) -> int:
        """Longest path through the model — Fixup init scale
        (vqvae/model.py:193-203)."""
        n_down = self.n_bottleneck_blocks * self.n_blocks_per_bottleneck
        return (
            2
            + 2 * n_down
            + self.n_pre_quantization_blocks
            + self.n_post_quantization_blocks
            + self.n_post_downscale_blocks * n_down
            + self.n_post_upscale_blocks * n_down
            + 1
        )

    def code_grid_shapes(self, volume_shape: Sequence[int]) -> List[Tuple[int, ...]]:
        """Code-grid spatial shapes (fine → coarse) for a given input volume."""
        shapes = []
        f = self.downscale_factor
        cur = tuple(volume_shape)
        for _ in range(self.n_enc):
            cur = tuple(s // f for s in cur)
            shapes.append(cur)
        return shapes


_REMAT_POLICIES = {
    None: None,
    "nothing": "nothing_saveable",
    "dots": "dots_saveable",
}


def _maybe_remat(cls, enable: bool, policy=None):
    if not enable:
        return cls
    if policy is not None:
        pol = getattr(jax.checkpoint_policies, _REMAT_POLICIES.get(policy, policy))
        return nn.remat(cls, policy=pol)
    return nn.remat(cls)


class Encoder(nn.Module):
    """Hierarchical encoder (default 'encoder2' variant, layers.py:519-588).

    Per level: DownBlock (n stride-2 halvings, channels ×2 each) →
    PreQuantizationConditioning (concat upsampled coarser quantization) →
    pre-q 'same' blocks at embedding width → Quantizer. Levels are processed
    deepest-first; the legacy 'encoder' variant (layers.py:390-460) applies
    the pre-q blocks at full feature width *before* conditioning.
    """

    config: VQVAEConfig

    @nn.compact
    def __call__(self, x, train: bool = False, folded_io: bool = False):
        cfg = self.config
        nl = cfg.num_layers
        down_cls = _maybe_remat(
            DownBlock, cfg.remat and cfg.remat_blocks, cfg.remat_policy
        )
        block = RESBLOCKS[cfg.block_type]
        block_r = _maybe_remat(block, cfg.remat, cfg.remat_policy)
        block_kw = (
            {"pad_mode": cfg.pad_mode} if cfg.block_type == "pre-activation" else {}
        )
        packed_on = (
            cfg.packed_stacks == "auto" and cfg.block_type == "pre-activation"
        )
        scan_on = cfg.scan_stacks and cfg.block_type == "pre-activation"

        # folded_io: caller delivers x already in the stem's space-to-depth
        # layout (the train step computes its loss there too, so the
        # full-resolution volume — and its strided s2d/d2s relayout copies —
        # never exist inside the step; see vqvae_train.vqvae_loss_fn).
        #
        # LITERAL STEM (stem_space_to_depth == 1) + folded_io: the caller
        # delivers s2d(x, 2) and the level-0 front-end (parse_input + the
        # first stride-2 resblock) runs in the folded domain via exact
        # weight-space embeddings — no full-res C≤4 tensor ever exists, which
        # is what lets converted reference checkpoints serve 512×512×128 on
        # one 16 GB chip (XLA's padded-layout copies of such tensors OOM it;
        # PERF.md). Parameter tree identical; the reference runs these
        # volumes whole too (vqvae/calc_ssim_from_checkpoint.py:31-38).
        lit_fold = folded_io and cfg.stem_space_to_depth == 1
        if lit_fold:
            assert scan_on, "literal folded serving needs pre-activation scan"
        if not folded_io:
            x = space_to_depth(x, cfg.stem_space_to_depth)
        x = Conv3D(
            features=cfg.base_network_channels,
            kernel_size=1,
            dtype=cfg.dtype,
            fold=lit_fold,
            name="parse_input",
        )(x)

        downs = []
        before = cfg.base_network_channels
        for i in range(cfg.n_enc):
            x = down_cls(
                in_channels=before,
                n_down=cfg.level_n_down(i),
                resblock=cfg.block_type,
                n_post_downscale_blocks=cfg.n_post_downscale_blocks,
                num_layers=nl,
                pad_mode=cfg.pad_mode,
                dtype=cfg.dtype,
                packed=packed_on,
                scan=scan_on,
                remat_scan=cfg.remat,
                fold_in=lit_fold and i == 0,
                name=f"down_{i}",
            )(x)
            before *= 2 ** cfg.level_n_down(i)
            downs.append(x)

        emb_dims = cfg.embedding_dims
        chans = cfg.level_channels

        aux = None
        results = []  # appended coarse → fine
        for i in reversed(range(cfg.n_enc)):
            h = downs[i]
            in_ch = chans[i] + (emb_dims[i] if i != cfg.n_enc - 1 else 0)

            if cfg.encoder_variant == "encoder":
                # legacy: pre-q blocks at full width before conditioning
                h = apply_same_stack(
                    h,
                    cfg.n_pre_quantization_blocks,
                    lambda j, pw, i=i: block_r(
                        out_channels=chans[i],
                        mode="same",
                        num_layers=nl,
                        dtype=cfg.dtype,
                        name=f"pre_quantize_{i}_{j}",
                        **({**block_kw, "packed_width": pw} if pw else block_kw),
                    ),
                    make_params=(
                        (
                            lambda j, i=i: PreActParams(
                                channels=chans[i],
                                num_layers=nl,
                                name=f"pre_quantize_{i}_{j}",
                            )()
                        )
                        if scan_on
                        else None
                    ),
                    enabled=packed_on,
                    remat=cfg.remat,
                    pad_mode=cfg.pad_mode,
                    dtype=cfg.dtype,
                )

            h = PreQuantizationConditioning(
                in_channels=in_ch,
                out_channels=emb_dims[i],
                n_up=cfg.n_blocks_per_bottleneck,
                resblock=cfg.block_type,
                n_post_upscale_blocks=cfg.n_post_upscale_blocks,
                num_layers=nl,
                pad_mode=cfg.pad_mode,
                dtype=cfg.dtype,
                packed=packed_on,
                scan=scan_on,
                remat_scan=cfg.remat,
                name=f"pre_quantize_cond_{i}",
            )(h, aux)

            if cfg.encoder_variant == "encoder2":
                h = apply_same_stack(
                    h,
                    cfg.n_pre_quantization_blocks,
                    lambda j, pw, i=i: block_r(
                        out_channels=emb_dims[i],
                        mode="same",
                        num_layers=nl,
                        dtype=cfg.dtype,
                        name=f"pre_quantize_{i}_{j}",
                        **({**block_kw, "packed_width": pw} if pw else block_kw),
                    ),
                    make_params=(
                        (
                            lambda j, i=i: PreActParams(
                                channels=emb_dims[i],
                                num_layers=nl,
                                name=f"pre_quantize_{i}_{j}",
                            )()
                        )
                        if scan_on
                        else None
                    ),
                    enabled=packed_on,
                    remat=cfg.remat,
                    pad_mode=cfg.pad_mode,
                    dtype=cfg.dtype,
                )

            loss, quantized, indices = Quantizer(
                num_embeddings=cfg.num_embeddings[i],
                embedding_dim=emb_dims[i],
                commitment_cost=cfg.commitment_cost,
                decay=cfg.ema_decay,
                laplace_alpha=cfg.laplace_alpha,
                argmin_method=cfg.argmin_method,
                name=f"quantize_{i}",
            )(h, train=train)
            results.append((loss, quantized, indices))
            aux = quantized

        return list(reversed(results))  # fine → coarse


class Decoder(nn.Module):
    """Hierarchical decoder (reference layers.py:463-517).

    Coarse → fine: at each level concat the level's code grid with the
    upsampled previous output (1x1x1 proj), run post-q 'same' blocks, then an
    UpBlock; finish with a 1x1x1 out conv.
    """

    config: VQVAEConfig

    @nn.compact
    def __call__(self, quantizations, train: bool = False, folded_io: bool = False):
        cfg = self.config
        nl = cfg.num_layers
        block_r = _maybe_remat(RESBLOCKS[cfg.block_type], cfg.remat, cfg.remat_policy)
        up_cls = _maybe_remat(
            UpBlock, cfg.remat and cfg.remat_blocks, cfg.remat_policy
        )
        block_kw = (
            {"pad_mode": cfg.pad_mode} if cfg.block_type == "pre-activation" else {}
        )
        packed_on = (
            cfg.packed_stacks == "auto" and cfg.block_type == "pre-activation"
        )
        scan_on = cfg.scan_stacks and cfg.block_type == "pre-activation"
        # literal-stem folded serving (see Encoder): the last up resblock,
        # its post-upscale stack and the out conv run in the folded domain
        lit_fold = folded_io and cfg.stem_space_to_depth == 1
        if lit_fold:
            assert scan_on, "literal folded serving needs pre-activation scan"

        emb_dims = cfg.embedding_dims

        out = None
        for i in reversed(range(cfg.n_enc)):
            # after_channels at level i == UpBlock output channels
            out_ch = (
                cfg.base_network_channels if i == 0 else cfg.level_channels[i - 1]
            )
            before_ch = cfg.level_channels[i]
            in_ch = emb_dims[i] + (before_ch if i != cfg.n_enc - 1 else 0)

            q = quantizations[i].astype(cfg.dtype) if cfg.dtype else quantizations[i]
            if i != cfg.n_enc - 1:
                h = jnp.concatenate([q, out], axis=-1)
                h = Conv3D(
                    features=in_ch, kernel_size=1, dtype=cfg.dtype, name=f"proj_{i}"
                )(h)
            else:
                h = q

            h = apply_same_stack(
                h,
                cfg.n_post_quantization_blocks,
                lambda j, pw, i=i, in_ch=in_ch: block_r(
                    out_channels=in_ch,
                    mode="same",
                    num_layers=nl,
                    dtype=cfg.dtype,
                    name=f"post_quantize_{i}_{j}",
                    **({**block_kw, "packed_width": pw} if pw else block_kw),
                ),
                make_params=(
                    (
                        lambda j, i=i, in_ch=in_ch: PreActParams(
                            channels=in_ch,
                            num_layers=nl,
                            name=f"post_quantize_{i}_{j}",
                        )()
                    )
                    if scan_on
                    else None
                ),
                enabled=packed_on,
                remat=cfg.remat,
                pad_mode=cfg.pad_mode,
                dtype=cfg.dtype,
            )

            out = up_cls(
                in_channels=in_ch,
                out_channels=out_ch,
                n_up=cfg.level_n_down(i),
                resblock=cfg.block_type,
                n_post_upscale_blocks=cfg.n_post_upscale_blocks,
                num_layers=nl,
                pad_mode=cfg.pad_mode,
                dtype=cfg.dtype,
                packed=packed_on,
                scan=scan_on,
                remat_scan=cfg.remat,
                fold_out=lit_fold and i == 0,
                name=f"up_{i}",
            )(h)

        f = cfg.stem_space_to_depth
        out = Conv3D(
            features=cfg.head_channels * f**3,
            kernel_size=1,
            dtype=cfg.dtype,
            fold=lit_fold,
            name="out",
        )(out)
        # folded_io: leave the output in the stem's s2d layout (channel
        # order (ph, pw, pd, head_ch) — what depth_to_space would unpack).
        # Literal stem + folded_io: the output is s2d(decoded, 2) — the
        # level-0 back-end (last 'up' resblock + its post stack + out conv)
        # ran in the folded domain; the host unfolds at IO time.
        return out if folded_io else depth_to_space(out, f)


class VQVAE(nn.Module):
    """Encoder + Decoder. ``__call__`` returns
    (decoded, (commitment_losses, quantizations, encoding_indices)) with the
    per-level tuples ordered fine → coarse (reference vqvae/model.py:79-89).
    """

    config: VQVAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")

    def __call__(self, x, train: bool = False, folded_io: bool = False):
        results = self.encode(x, train=train, folded_io=folded_io)
        losses, quantizations, indices = zip(*results)
        decoded = self.decode(quantizations, train=train, folded_io=folded_io)
        return decoded, (losses, quantizations, indices)

    def encode(self, x, train: bool = False, folded_io: bool = False):
        return self.encoder(x, train=train, folded_io=folded_io)

    def decode(self, quantizations, train: bool = False, folded_io: bool = False):
        return self.decoder(quantizations, train=train, folded_io=folded_io)

def embed_code(variables, level: int, indices: jax.Array) -> jax.Array:
    """Functional codebook lookup from a full VQVAE variable tree.

    indices: (...,) int code grid → (..., D) fp32 embeddings (used by
    decode_embeddings; reference vqvae/decode_embeddings.py:34-38).
    """
    embed = variables["quantizer"]["encoder"][f"quantize_{level}"]["embed"]
    return jnp.take(embed, indices, axis=0)
