from coarsegrainingvae_tpu.ops.activations import get_activation, swish, shifted_softplus
from coarsegrainingvae_tpu.ops.basis import (
    cosine_envelope,
    gaussian_smearing,
    painn_radial_basis,
)
from coarsegrainingvae_tpu.ops.segment import (
    segment_mean,
    segment_softmax,
    segment_sum,
)
from coarsegrainingvae_tpu.ops.geometry import (
    edge_vectors,
    preprocess_r,
    random_rotation_matrices,
    rotate,
)
from coarsegrainingvae_tpu.ops.pallas_message import fused_message, message_reference
from coarsegrainingvae_tpu.ops.pallas_pseudo import (
    fused_pseudo_message,
    pseudo_reference,
)
