from vqvae3d_tpu.train.state import VQVAETrainState, create_vqvae_train_state
from vqvae3d_tpu.train.vqvae_train import (
    make_train_step,
    make_eval_step,
    vqvae_loss_fn,
    huber_loss,
)
