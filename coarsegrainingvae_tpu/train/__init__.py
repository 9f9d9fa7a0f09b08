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
from coarsegrainingvae_tpu.train.checkpoint import CheckpointManager
from coarsegrainingvae_tpu.train.diffpool_trainer import DiffPoolTrainer, diffpool_loss
from coarsegrainingvae_tpu.train.baseline_trainer import BaselineTrainer, baseline_loss
from coarsegrainingvae_tpu.train.pcn_trainer import PCNTrainer, pcn_loss
