from vqvae3d_tpu.sample.ar_sample import (
    ancestral_sample,
    make_ancestral_sampler,
)
