from vqvae3d_tpu.models.blocks import (
    EvoNorm3DS0,
    FixupResBlock,
    PreActFixupResBlock,
    EvonormResBlock,
    ResizeConv3D,
    DownBlock,
    UpBlock,
    PreQuantizationConditioning,
    RESBLOCKS,
)
from vqvae3d_tpu.models.quantizer import Quantizer, QuantizerState
from vqvae3d_tpu.models.vqvae import Encoder, Decoder, VQVAE, VQVAEConfig
