from coarsegrainingvae_tpu.eval.metrics import (
    COVALENT_RADII,
    bond_graphs_batch,
    compute_rmsd_batch,
    evaluate_samples,
    graph_diff_ratio,
    valid_ratio,
)
from coarsegrainingvae_tpu.eval.sampling import sample_ensemble, reconstruct_all
from coarsegrainingvae_tpu.eval.analysis import (
    get_cv_stats,
    kde_free_energy,
    pairwise_distance_features,
    ramachandran,
    tica,
)
