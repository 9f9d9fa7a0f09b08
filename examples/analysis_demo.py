"""Post-hoc analysis demo: TICA free-energy landscape of a finished run.

Reloads a trained fold (cli.postanalysis.reevaluate), projects the true and
generated ensembles into the shared TICA space learned from the true
trajectory, and renders the reference's headline analysis figures
(plots.py:61-85 free-energy KDE + postanalysis.py:25-68 TICA projection in
/root/reference) as committed PNG artifacts:

    python examples/analysis_demo.py \
        -modelparams <run>/modelparams.json -logdir <run>/fold0 \
        -out examples/results/analysis_demo
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-modelparams", required=True)
    p.add_argument("-logdir", required=True)
    p.add_argument("-out", default="examples/results/analysis_demo")
    p.add_argument("-nevals", type=int, default=36)
    p.add_argument("-n_ensemble", type=int, default=16)
    a = p.parse_args(argv)

    from coarsegrainingvae_tpu.cli.postanalysis import reevaluate
    from coarsegrainingvae_tpu.eval.analysis import plot_free_energy

    res = reevaluate(a.modelparams, a.logdir, graph_eval=True,
                     n_ensemble=a.n_ensemble, nevals=a.nevals)
    os.makedirs(a.out, exist_ok=True)

    true_t = np.asarray(res["tica_true"])
    gen_t = np.asarray(res["tica_gen"])
    plot_free_energy(true_t[:, 0], true_t[:, 1],
                     os.path.join(a.out, "free_energy_true.png"))
    plot_free_energy(gen_t[:, 0], gen_t[:, 1],
                     os.path.join(a.out, "free_energy_generated.png"))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4))
    ax.scatter(true_t[:, 0], true_t[:, 1], s=4, alpha=0.25, label="MD (true)")
    ax.scatter(gen_t[:, 0], gen_t[:, 1], s=4, alpha=0.25, label="generated")
    ax.set_xlabel("TIC 1")
    ax.set_ylabel("TIC 2")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(a.out, "tica_overlay.png"), dpi=150)
    plt.close(fig)

    np.savez(os.path.join(a.out, "tica_projections.npz"),
             tica_true=true_t, tica_gen=gen_t)

    summary = {k: v for k, v in res.items() if not k.startswith("tica")}
    # on-manifold check: how far does a generated TICA point sit from the
    # true ensemble, in units of the true ensemble's own NN spacing? ~1
    # means generated points are statistically indistinguishable from true
    # samples; coverage uses the true set's 95th-percentile NN radius
    from scipy.spatial import cKDTree

    tree = cKDTree(true_t)
    d_gen, _ = tree.query(gen_t)
    d_true, _ = tree.query(true_t, k=2)
    nn_true = d_true[:, 1]
    summary["tica_gen_nn_over_true_nn"] = float(
        np.median(d_gen) / max(np.median(nn_true), 1e-12)
    )
    thresh = float(np.quantile(nn_true, 0.95))
    summary["tica_coverage_frac"] = float((d_gen <= thresh).mean())
    summary["tica_nn_threshold"] = thresh
    with open(os.path.join(a.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
