from coarsegrainingvae_tpu.models.modules import Dense, DistanceEmbed, MLP, SchNetEdgeFilter
from coarsegrainingvae_tpu.models.conv import (
    ContractiveMessageBlock,
    ENMessageBlock,
    EquiMessageBlock,
    EquiMessageCross,
    EquiMessagePseudo,
    EquiMessagePseudo2,
    InvMessageBlock,
    InvariantFilter,
    InvariantMessage,
    PseudoUpdateBlock,
    UpdateBlock,
)
from coarsegrainingvae_tpu.models.cgvae import (
    CGequiVAE,
    CGprior,
    ENDecoder,
    EquiEncoder,
    EquivariantDecoder,
    EquivariantPseudoDecoder,
    PCN,
    build_cgequivae,
)
from coarsegrainingvae_tpu.models.cgae import CGaeParams, cgae_forward, gumbel_softmax, learn_map
from coarsegrainingvae_tpu.models.dense import (
    DenseCGPrior,
    DenseContract,
    DenseEquiEncoder,
    DenseEquiMessageBlock,
    DenseEquivariantDecoder,
    DenseInvariantMessage,
    DenseUpdateBlock,
)
from coarsegrainingvae_tpu.models.diffpool import CGpool, DiffPoolVAE, tau_schedule
from coarsegrainingvae_tpu.models.baseline import (
    BASELINE_ZOO,
    EdgeSetMLP,
    EquiLinear,
    EquiMLP,
    LinearBaseline,
    MLPBaseline,
    SetEquiMLP,
    build_baseline,
)
from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE, DenseEquiMessagePseudo
from coarsegrainingvae_tpu.models.dense import DenseFactoredEquiMessage
