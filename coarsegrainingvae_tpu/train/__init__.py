from coarsegrainingvae_tpu.train.losses import kl_divergence, vae_loss
from coarsegrainingvae_tpu.train.trainer import (
    Trainer,
    TrainState,
    make_optimizer,
)
from coarsegrainingvae_tpu.train.controller import (
    EarlyStopping,
    LowessPlateauController,
    lowess_smooth,
)
