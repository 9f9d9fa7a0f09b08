from coarsegrainingvae_tpu.models.modules import Dense, DistanceEmbed, MLP, SchNetEdgeFilter
from coarsegrainingvae_tpu.models.conv import (
    ContractiveMessageBlock,
    ENMessageBlock,
    EquiMessageBlock,
    EquiMessageCross,
    EquiMessagePseudo,
    InvMessageBlock,
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
