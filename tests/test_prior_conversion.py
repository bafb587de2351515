"""Prior checkpoint conversion parity vs the reference torch modules.

pytorch_lightning is unavailable, so the oracle rebuilds the reference
PixelCNN forward wiring (pixelcnn.py:298-315) directly from the reference's
layer modules (pixel_model/layers.py, importable with torch+einops only) and
compares against our PixelCNN with converted weights.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
from vqvae3d_tpu.train.checkpoint import convert_reference_pixelcnn_state_dict

DIMS = (3, 4, 3)


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    import importlib

    layers = importlib.import_module("pixel_model.layers")
    return torch, layers


def test_pixelsnail_conversion_parity(ref):
    """Unconditional only: the reference's conditional PixelSNAIL path is
    unrunnable (CausalAttentionPixelBlock passes the condition tensor as
    condition_cache, layers.py:688 — .popleft() on a tensor crashes)."""
    torch, L = ref
    import math

    from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
    from vqvae3d_tpu.train.checkpoint import convert_reference_pixelsnail_state_dict

    torch.manual_seed(0)
    input_dim, model_dim = 6, 8
    cfg = PixelSNAILConfig(
        input_dim=input_dim,
        condition_dim=0,
        model_dim=model_dim,
        kernel_size=3,
        num_layers_per_block=2,
        num_blocks=1,
        causal_dropout_prob=0.0,
        attention_dropout_prob=0.0,
        bottleneck_divisor=2,
        num_heads=2,
        dtype=jnp.float32,
    )

    from functools import partial

    tnn = torch.nn
    causal_conv = partial(
        L.PreActFixupCausalResBlock,
        in_channels=model_dim,
        out_channels=model_dim,
        kernel_size=3,
        dropout_prob=0.0,
        condition_dim=0,
        condition_kernel_size=1,
        bottleneck_divisor=2,
    )
    parse_input = tnn.Conv3d(input_dim, model_dim, 1)
    to_causal = causal_conv(mask="A")
    blocks = tnn.ModuleList(
        [
            L.CausalAttentionPixelBlock(
                in_channels=model_dim,
                bottleneck_divisor=2,
                causal_conv=partial(causal_conv, mask="B"),
                num_layers=2,
                num_heads=2,
                attention_dropout_prob=0.0,
            )
        ]
    )
    parse_output = tnn.Conv3d(model_dim, input_dim, 1)
    container = tnn.ModuleDict(
        {
            "parse_input": parse_input,
            "to_causal": to_causal,
            "layers": blocks,
            "parse_output": parse_output,
        }
    )
    with torch.no_grad():
        for p in container.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    container.eval()

    x_t = torch.rand(1, input_dim, *DIMS)
    b = 1
    d, h, w = DIMS
    background = torch.cat(
        [
            torch.linspace(-1, 1, d).view(1, 1, 1, -1, 1, 1).expand(3, b, 1, d, h, w),
            torch.linspace(-1, 1, h).view(1, 1, 1, 1, -1, 1).expand(3, b, 1, d, h, w),
            torch.linspace(-1, 1, w).view(1, 1, 1, 1, 1, -1).expand(3, b, 1, d, h, w),
        ],
        dim=2,
    )
    size = math.prod(DIMS)
    attn_mask = torch.tril(torch.ones((size, size))).bool()

    with torch.no_grad():
        stack = L.input_to_stack(parse_input(x_t))
        stack = to_causal(stack, condition=None)
        for blk in blocks:
            stack = blk(stack, background, attn_mask, None, None)
        ref_logits = parse_output(L.stack_to_output(stack))

    sd = {k: v.numpy() for k, v in container.state_dict().items()}
    variables = convert_reference_pixelsnail_state_dict(sd, cfg)

    model = PixelSNAIL(cfg)
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy())
    got = model.apply(variables, x_j, None, train=False)

    np.testing.assert_allclose(
        np.asarray(got),
        ref_logits.permute(0, 2, 3, 4, 1).numpy(),
        atol=3e-4,
    )


@pytest.mark.parametrize("with_cond", [False, True])
def test_pixelcnn_conversion_parity(ref, with_cond):
    torch, L = ref
    torch.manual_seed(0)

    input_dim, condition_dim, model_dim, n_blocks = 6, 5, 8, 2
    cfg = PixelCNNConfig(
        input_dim=input_dim,
        condition_dim=condition_dim if with_cond else 0,
        model_dim=model_dim,
        kernel_size=3,
        num_resblocks=n_blocks,
        dropout_prob=0.0,
        bottleneck_divisor=2,
        dtype=jnp.float32,
    )

    # reference module tree (the PixelCNN constructor wiring, pixelcnn.py:39-79)
    tnn = torch.nn
    parse_input = tnn.Conv3d(input_dim, model_dim, 1)
    embed_condition = (
        tnn.Conv3d(condition_dim, model_dim, 1) if with_cond else None
    )
    blocks = tnn.ModuleList(
        [
            L.PreActFixupCausalResBlock(
                in_channels=model_dim,
                out_channels=model_dim,
                kernel_size=3,
                mask="A" if i == 0 else "B",
                dropout_prob=0.0,
                condition_dim=model_dim if with_cond else 0,
                condition_kernel_size=1,
                bottleneck_divisor=2,
            )
            for i in range(n_blocks + 1)
        ]
    )
    parse_output = tnn.Conv3d(model_dim, input_dim, 1)

    container = tnn.ModuleDict(
        {"parse_input": parse_input, "layers": blocks, "parse_output": parse_output}
    )
    if with_cond:
        container["embed_condition"] = embed_condition
    with torch.no_grad():
        for p in container.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    container.eval()

    x_t = torch.rand(1, input_dim, *DIMS)
    cond_t = torch.rand(1, condition_dim, *DIMS) if with_cond else None

    with torch.no_grad():
        stack = L.input_to_stack(parse_input(x_t))
        cond_emb = embed_condition(cond_t) if with_cond else None
        for blk in blocks:
            stack = blk(stack, condition=cond_emb)
        ref_logits = parse_output(L.stack_to_output(stack))

    sd = {k: v.numpy() for k, v in container.state_dict().items()}
    variables = convert_reference_pixelcnn_state_dict(sd, cfg)

    model = PixelCNN(cfg)
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy())
    cond_j = (
        jnp.asarray(cond_t.permute(0, 2, 3, 4, 1).numpy()) if with_cond else None
    )
    got = model.apply(variables, x_j, cond_j, train=False)

    np.testing.assert_allclose(
        np.asarray(got),
        ref_logits.permute(0, 2, 3, 4, 1).numpy(),
        atol=2e-4,
    )
