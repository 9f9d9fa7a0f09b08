from coarsegrainingvae_tpu.utils.xyz import read_xyz, write_xyz
from coarsegrainingvae_tpu.utils.logging import CSVLogger, JSONLLogger, annotate_job
from coarsegrainingvae_tpu.utils.pdb import write_pdb
from coarsegrainingvae_tpu.utils.profiling import StepTimer, save_runtime, time_compile, trace
from coarsegrainingvae_tpu.utils.visualization import (
    rotate_grid,
    save_rotate_frames,
    xyz_grid_view,
)
