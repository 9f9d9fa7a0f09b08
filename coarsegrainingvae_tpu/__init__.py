"""CoarseGrainingVAE-TPU: a TPU-native framework for generative coarse-graining
of molecular conformations (backmapping CG beads -> all-atom coordinates).

Built from scratch in JAX/Flax/Pallas with the same capabilities as the
PyTorch/torch_scatter reference (wwang2/CoarseGrainingVAE), redesigned around
TPU hardware: fixed-shape packed graph batches, segment-sum message passing,
(nodes, 3, F) vector-feature layout for lane-friendly tiling, and
`jax.sharding` data parallelism over device meshes.
"""

__version__ = "0.1.0"

from coarsegrainingvae_tpu import config as config
from coarsegrainingvae_tpu import ops as ops
from coarsegrainingvae_tpu import models as models
from coarsegrainingvae_tpu import data as data
from coarsegrainingvae_tpu.serve import Backmapper
