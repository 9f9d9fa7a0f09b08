from coarsegrainingvae_tpu.data.batch import CGBatch, flatten_ids
from coarsegrainingvae_tpu.data.neighbors import (
    radius_graph_dense,
    radius_graph_frames,
    make_directed,
)
from coarsegrainingvae_tpu.data.topology import (
    channel_index_from_mapping,
    cg_graph_from_bonds,
    high_order_edges,
)
from coarsegrainingvae_tpu.data.dataset import CGDatasetArrays, build_dataset, kfold_indices
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.data import mappings as mappings
from coarsegrainingvae_tpu.data.diffpool import (
    DiffPoolBatch,
    DiffPoolDatasetArrays,
    build_diffpool_dataset,
)
from coarsegrainingvae_tpu.data.proteins import PROTEINFILES, load_frames, load_npz_traj, save_npz_traj
from coarsegrainingvae_tpu.data.sidechain import (
    ATOM_MAP_14,
    RES2IDX,
    THREE_LETTER_TO_ONE,
    build_pcn_dataset,
    protein_props,
)
from coarsegrainingvae_tpu.data.synthetic import synthetic_protein
