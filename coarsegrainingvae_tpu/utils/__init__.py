from coarsegrainingvae_tpu.utils.xyz import read_xyz, write_xyz
from coarsegrainingvae_tpu.utils.logging import CSVLogger, JSONLLogger, annotate_job
