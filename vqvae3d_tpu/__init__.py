"""vqvae3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for hierarchical
3D VQ-VAE-2 CT-scan synthesis.

Re-designed from scratch with the capability surface of sara-nl/3D-VQ-VAE-2
(reference mounted at /root/reference):

  * Stage 1: hierarchical 3D VQ-VAE (Fixup residual stacks, EMA vector
    quantizer) — ``vqvae3d_tpu.models.vqvae``
  * Stage 2: autoregressive PixelCNN / PixelSNAIL priors over the discrete
    code grids — ``vqvae3d_tpu.models.pixelcnn`` / ``pixelsnail``
  * Pipeline: train → extract codes → train priors → ancestral sampling →
    decode volumes — ``vqvae3d_tpu.cli``

Design notes (TPU-first, not a port):
  * channels-last (N, D, H, W, C) layout everywhere (XLA TPU native).
  * bf16 compute / fp32 params policy; the quantizer is pinned to fp32.
  * All distributed behavior is expressed via ``jax.sharding`` over a Mesh;
    cross-device codebook statistics reductions are global-batch reductions
    that XLA lowers to ICI collectives (the reference used hand-written NCCL
    all_reduce, vqvae/layers.py:645-647).
  * Hot ops (codebook L2-argmin, causal attention) have Pallas TPU kernels
    with pure-JAX reference implementations used for parity testing.
"""

__version__ = "0.1.0"
