"""PixelSNAIL prior: causal convs + causal attention over voxel sequences.

Re-designs /root/reference/pixel_model/pixelsnail.py: a mask-'A' entry
resblock then ``num_blocks`` CausalAttentionPixelBlocks, each = N causal
resblocks + multi-head causal attention keyed on (stack, out, coordinate
background) (reference :53-89, :301-320). The dense tril attention mask the
reference materializes (:295-298) is built inside the attention op; grids
this model is used on are ≤ a few thousand voxels (the finest level uses
pure PixelCNN, see SURVEY §5).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae3d_tpu.models.causal_blocks import (
    CausalAttentionPixelBlock,
    PreActFixupCausalResBlock,
    input_to_stack,
    stack_to_output,
)
from vqvae3d_tpu.models.prior_utils import generate_background
from vqvae3d_tpu.ops.conv3d import Conv3D


@dataclasses.dataclass(frozen=True)
class PixelSNAILConfig:
    """Mirrors pixelsnail.py:193-217 argparse surface."""

    input_dim: int = 256
    condition_dim: int = 0
    model_dim: int = 32
    kernel_size: int = 3
    num_layers_per_block: int = 5
    num_blocks: int = 5
    causal_dropout_prob: float = 0.5
    attention_dropout_prob: float = 0.5
    bottleneck_divisor: int = 4
    num_heads: int = 8
    mixup_alpha: float = 0.0
    lr: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def use_conditioning(self) -> bool:
        return self.condition_dim > 0

    @property
    def num_layers(self) -> int:
        return self.num_blocks * self.num_layers_per_block + 1


class PixelSNAIL(nn.Module):
    config: PixelSNAILConfig

    @nn.compact
    def __call__(
        self,
        data: jax.Array,  # (B, s0, s1, s2, input_dim) one-hot
        condition: Optional[jax.Array] = None,
        train: bool = False,
        folded_logits: bool = False,  # accepted for loss-API parity with
        #                               PixelCNN; PixelSNAIL grids are tiny
        #                               (S ≤ 8192) so block space never pays
    ) -> jax.Array:
        cfg = self.config
        assert (condition is not None) == cfg.use_conditioning
        del folded_logits

        if (
            cfg.use_conditioning
            and condition.shape[1:4] != data.shape[1:4]
        ):
            # coarse one-hot condition: reference order (upsample, embed)
            from vqvae3d_tpu.ops.resize import trilinear_resize

            condition = trilinear_resize(condition, data.shape[1:4])

        b, s0, s1, s2, _ = data.shape
        background = generate_background(b, (s0, s1, s2))

        h = Conv3D(
            features=cfg.model_dim, kernel_size=1, dtype=cfg.dtype, name="parse_input"
        )(data)
        stack = input_to_stack(h)

        cond_dim = cfg.model_dim if cfg.use_conditioning else 0
        cond_embedded = None
        if cfg.use_conditioning:
            cond_embedded = Conv3D(
                features=cfg.model_dim,
                kernel_size=1,
                dtype=cfg.dtype,
                name="embed_condition",
            )(condition)

        stack = PreActFixupCausalResBlock(
            out_channels=cfg.model_dim,
            kernel_size=cfg.kernel_size,
            mask="A",
            condition_dim=cond_dim,
            dropout_prob=cfg.causal_dropout_prob,
            bottleneck_divisor=cfg.bottleneck_divisor,
            num_layers=cfg.num_layers,
            dtype=cfg.dtype,
            name="to_causal",
        )(stack, condition=cond_embedded, train=train)

        for i in range(cfg.num_blocks):
            stack = CausalAttentionPixelBlock(
                model_dim=cfg.model_dim,
                kernel_size=cfg.kernel_size,
                num_layers_per_block=cfg.num_layers_per_block,
                bottleneck_divisor=cfg.bottleneck_divisor,
                condition_dim=cond_dim,
                num_heads=cfg.num_heads,
                causal_dropout_prob=cfg.causal_dropout_prob,
                attention_dropout_prob=cfg.attention_dropout_prob,
                num_layers=cfg.num_layers,
                dtype=cfg.dtype,
                name=f"block_{i}",
            )(stack, background, condition=cond_embedded, train=train)

        out = stack_to_output(stack)
        logits = Conv3D(
            features=cfg.input_dim, kernel_size=1, dtype=cfg.dtype, name="parse_output"
        )(out)
        return logits.astype(jnp.float32)
