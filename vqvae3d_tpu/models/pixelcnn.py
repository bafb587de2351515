"""PixelCNN prior over one hierarchy level's code grid.

Re-designs /root/reference/pixel_model/pixelcnn.py as a pure flax module:
one-hot codes → 1x1x1 ``parse_input`` → N+1 causal resblocks (first mask
'A', rest 'B') with per-block conditioning on the trilinearly-upsampled
one-hot of the next-coarser grid → 1x1x1 ``parse_output`` logits
(reference :39-79, :298-315).

The training loss (cross-entropy + optional mixup + bits/dim) lives in
vqvae3d_tpu.train.prior_train; sampling in vqvae3d_tpu.sample.ar_sample.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae3d_tpu.models.causal_blocks import (
    CausalPreActParams,
    FixupCausalResBlock,
    PreActFixupCausalResBlock,
    input_to_stack,
    stack_to_output,
)
from vqvae3d_tpu.ops.causal_stack import apply_causal_stack, causal_stack_ok
from vqvae3d_tpu.ops.conv3d import Conv3D


@dataclasses.dataclass(frozen=True)
class PixelCNNConfig:
    """Mirrors pixelcnn.py:185-211 argparse surface."""

    input_dim: int = 256  # codebook size of this level
    condition_dim: int = 0  # codebook size of the coarser level (0 = none)
    model_dim: int = 32
    kernel_size: int = 3
    num_resblocks: int = 18
    dropout_prob: float = 0.5
    use_pre_activation: bool = True
    bottleneck_divisor: int = 4
    use_concat_activation: bool = False
    mixup_alpha: float = 0.0  # 0 disables mixup
    lr: float = 1e-5
    dtype: Any = jnp.bfloat16
    # Run the mask-'B' blocks as ONE lax.scan in 2x block space when the
    # grid/channel shape pays XLA's lane-padding tax (ops/causal_stack.py).
    # Parameter tree is identical either way. remat_scan checkpoints the
    # scan body so backward saves only the per-block carry (3 streams),
    # not every conv intermediate — without it the published top config
    # (50 blocks over the 128x128x32 grid) overflows HBM by ~4 GB, and
    # XLA cannot rematerialize across scan iterations on its own. The
    # recompute is one extra forward of a DMA-bound segment: cheap.
    scan_stacks: bool = True
    remat_scan: bool = True

    @property
    def use_conditioning(self) -> bool:
        return self.condition_dim > 0

    @property
    def num_layers(self) -> int:
        return self.num_resblocks + 1


class PixelCNN(nn.Module):
    config: PixelCNNConfig

    @nn.compact
    def __call__(
        self,
        data: jax.Array,  # (B, s0, s1, s2, input_dim) one-hot (or mixup-soft)
        condition: Optional[jax.Array] = None,  # (B, s0, s1, s2, condition_dim)
        train: bool = False,
        folded_logits: bool = False,
    ) -> jax.Array:
        """condition may arrive at the COARSER grid (the next level's code
        grid, one-hot): since the 1x1 embedding is affine and trilinear
        upsampling preserves constants, embed-then-upsample equals the
        reference's upsample-then-embed (pixelcnn.py:116-119) exactly — and
        moves the upsample from condition_dim channels to model_dim.
        ``folded_logits=True`` returns logits in the 2x block-space layout
        (B, s/2, s/2, s/2, 8*input_dim), lane order (phase, class) — only
        when the block-space path is active (callers detect by shape)."""
        cfg = self.config
        assert (condition is not None) == cfg.use_conditioning

        use_scan = (
            cfg.scan_stacks
            and cfg.use_pre_activation
            and not cfg.use_concat_activation
            and cfg.num_resblocks >= 1
            and causal_stack_ok(
                cfg.model_dim,
                tuple(data.shape[1:4]),
                cfg.num_resblocks,
                kernel_size=cfg.kernel_size,
            )
        )
        if use_scan:
            # the ENTIRE interior runs in 2x block space — one fold of the
            # (lane-dense) one-hot input, folded 1x1 io convs, the mask-'A'
            # block with shift-folded kernels, the mask-'B' segment as a
            # scan / megakernel, one unfold of the (lane-dense) logits. No
            # model_dim-channel tensor ever materializes at full res.
            from vqvae3d_tpu.models.causal_blocks import (
                CausalPreActParamsA,
                _Kernel,
            )
            from vqvae3d_tpu.ops.causal_stack import (
                causal_preact_block_A_folded,
                fold_causal_block_params_A,
                folded_1x1,
            )
            from vqvae3d_tpu.ops.conv3d import torch_conv_default_init
            from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth

            cdim = cfg.model_dim if cfg.use_conditioning else 0
            wpi, bpi = _Kernel(
                (1, 1, 1, cfg.input_dim, cfg.model_dim),
                torch_conv_default_init(),
                use_bias=True,
                name="parse_input",
            )()
            xf = space_to_depth(data.astype(cfg.dtype), 2)
            hf = folded_1x1(xf, wpi, bpi)
            stack = input_to_stack(hf)

            cond_f = None
            if cfg.use_conditioning:
                wec, bec = _Kernel(
                    (1, 1, 1, cfg.condition_dim, cfg.model_dim),
                    torch_conv_default_init(),
                    use_bias=True,
                    name="embed_condition",
                )()
                if condition.shape[1:4] != data.shape[1:4]:
                    # coarse one-hot: embed tiny, upsample model_dim, fold
                    from vqvae3d_tpu.ops.resize import trilinear_resize

                    cemb = (
                        jnp.einsum(
                            "bdhwk,ko->bdhwo",
                            condition.astype(cfg.dtype),
                            wec[0, 0, 0],
                        )
                        + bec.astype(cfg.dtype)
                    )
                    cemb = trilinear_resize(cemb, data.shape[1:4])
                    cond_f = space_to_depth(cemb.astype(cfg.dtype), 2)
                else:
                    cond_f = folded_1x1(
                        space_to_depth(condition.astype(cfg.dtype), 2),
                        wec,
                        bec,
                    )

            dropout_on = train and cfg.dropout_prob > 0
            pa = CausalPreActParamsA(
                channels=cfg.model_dim,
                kernel_size=cfg.kernel_size,
                condition_dim=cdim,
                bottleneck_divisor=cfg.bottleneck_divisor,
                num_layers=cfg.num_layers,
                name="layer_0",
            )()
            stack = causal_preact_block_A_folded(
                stack,
                fold_causal_block_params_A(pa, cfg.kernel_size),
                cond_f,
                kernel_size=cfg.kernel_size,
                dropout_prob=cfg.dropout_prob,
                train=train,
                rng=self.make_rng("dropout") if dropout_on else None,
            )
            per_block = [
                CausalPreActParams(
                    channels=cfg.model_dim,
                    kernel_size=cfg.kernel_size,
                    condition_dim=cdim,
                    bottleneck_divisor=cfg.bottleneck_divisor,
                    num_layers=cfg.num_layers,
                    name=f"layer_{i}",
                )()
                for i in range(1, cfg.num_resblocks + 1)
            ]
            stacked = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *per_block
            )
            stack = apply_causal_stack(
                stack,
                stacked,
                cond_f,
                kernel_size=cfg.kernel_size,
                dropout_prob=cfg.dropout_prob,
                train=train,
                rng=self.make_rng("dropout") if dropout_on else None,
                remat=cfg.remat_scan,
                folded_io=True,
            )
            out_f = stack_to_output(stack)
            wpo, bpo = _Kernel(
                (1, 1, 1, cfg.model_dim, cfg.input_dim),
                torch_conv_default_init(),
                use_bias=True,
                name="parse_output",
            )()
            logits_f = folded_1x1(out_f, wpo, bpo)
            if folded_logits:
                return logits_f.astype(jnp.float32)
            return depth_to_space(logits_f, 2).astype(jnp.float32)

        if (
            cfg.use_conditioning
            and condition.shape[1:4] != data.shape[1:4]
        ):
            # naive path with a coarse condition: reproduce the reference
            # order (upsample the one-hot, then embed)
            from vqvae3d_tpu.ops.resize import trilinear_resize

            condition = trilinear_resize(condition, data.shape[1:4])

        h = Conv3D(
            features=cfg.model_dim, kernel_size=1, dtype=cfg.dtype, name="parse_input"
        )(data)
        stack = input_to_stack(h)

        cond_embedded = None
        if cfg.use_conditioning:
            cond_embedded = Conv3D(
                features=cfg.model_dim,
                kernel_size=1,
                dtype=cfg.dtype,
                name="embed_condition",
            )(condition)

        block_cls = (
            PreActFixupCausalResBlock if cfg.use_pre_activation else FixupCausalResBlock
        )

        for i in range(cfg.num_resblocks + 1):
            kwargs = dict(
                out_channels=cfg.model_dim,
                kernel_size=cfg.kernel_size,
                mask="A" if i == 0 else "B",
                dropout_prob=cfg.dropout_prob,
                num_layers=cfg.num_layers,
                dtype=cfg.dtype,
                name=f"layer_{i}",
            )
            if cfg.use_pre_activation:
                kwargs.update(
                    condition_dim=cfg.model_dim if cfg.use_conditioning else 0,
                    bottleneck_divisor=cfg.bottleneck_divisor,
                    concat_activation=cfg.use_concat_activation,
                )
                stack = block_cls(**kwargs)(
                    stack, condition=cond_embedded, train=train
                )
            else:
                stack = block_cls(**kwargs)(stack, train=train)

        out = stack_to_output(stack)
        logits = Conv3D(
            features=cfg.input_dim, kernel_size=1, dtype=cfg.dtype, name="parse_output"
        )(out)
        return logits.astype(jnp.float32)
