from vqvae3d_tpu.metrics.evaluate import nmse, psnr, ssim2d, ssim3d_slices
from vqvae3d_tpu.metrics.distribution import (
    logistic_log_prob,
    mixture_nll_loss,
    sample_mixture,
    generic_nll_loss,
)
from vqvae3d_tpu.metrics.baur import baur_loss_3d
