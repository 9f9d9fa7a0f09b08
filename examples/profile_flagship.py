"""Ablation profiler for the flagship train step (dipeptide bench config).

Times device-bound variants of the step (full train step, grad-only,
forward-only) and the individual module families at their exact in-model
shapes, each as a lax.scan so tunnel latency is amortized and iterations
serialize through the carry. Prints one JSON line per measurement.

Usage:  python examples/profile_flagship.py [--steps 50] [--dtype float32]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, carry, n_steps: int, label: str, per_step_items: float = 0.0,
               const=None):
    """fn(carry, const) -> carry; times a jitted n-step lax.scan, synced by
    device_get (block_until_ready is unreliable on the tunneled backend).
    `const` is passed through jit so batch data is traced, not closure-baked."""

    def body(k, c, _):
        return fn(c, k), ()

    @jax.jit
    def run(c, k):
        c, _ = jax.lax.scan(lambda cc, x: body(k, cc, x), c, None, length=n_steps)
        return c

    c = run(carry, const)  # compile + warmup
    jax.device_get(jax.tree.leaves(c)[0])
    t0 = time.perf_counter()
    c = run(carry, const)
    jax.device_get(jax.tree.leaves(c)[0])
    dt = (time.perf_counter() - t0) / n_steps
    row = {"label": label, "ms_per_step": round(dt * 1e3, 3)}
    if per_step_items:
        row["items_per_s"] = round(per_step_items / dt, 1)
    print(json.dumps(row), flush=True)
    return dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--config", default="dipeptide",
                   choices=["dipeptide", "chignolin"])
    p.add_argument("--dtype", default="float32")
    p.add_argument(
        "--only", default="", help="comma list: step,parts,modules (default all)"
    )
    p.add_argument("--impl", default="einsum",
                   help="message_impl for the dense flagship (einsum|qmat)")
    p.add_argument("--pseudo-impl", dest="pseudo_impl", default="stacked",
                   help="pseudo_impl for the decoder (einsum|stacked)")
    p.add_argument("--adam_dtype", default="float32",
                   help="Adam moment storage dtype (float32|bfloat16)")
    args = p.parse_args()
    which = set(args.only.split(",")) if args.only else {"step", "parts", "modules"}

    from coarsegrainingvae_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    from coarsegrainingvae_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from coarsegrainingvae_tpu.data.dataset import build_dataset
    from coarsegrainingvae_tpu.data.mappings import newman_mapping
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.models.cgvae import flatten_batch
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE
    from coarsegrainingvae_tpu.parallel.mesh import make_mesh
    from coarsegrainingvae_tpu.train.losses import vae_loss
    from coarsegrainingvae_tpu.train.trainer import Trainer

    batch_size = args.batch
    if args.config == "chignolin":
        # reference README.md:64 hyperparameters (dec_type=cross)
        mc = dict(n_cgs=6, n_basis=600, n_rbf=10, atom_cutoff=12.0,
                  cg_cutoff=25.0, enc_nconv=2, dec_nconv=9,
                  activation="swish", dec_type="cross", breaksym=False)
        if args.batch == 32:
            batch_size = 2
    else:
        mc = dict(n_cgs=3, n_basis=600, n_rbf=8, atom_cutoff=8.5,
                  cg_cutoff=9.5, enc_nconv=4, dec_nconv=5,
                  activation="swish", dec_type="pseudo", breaksym=True)
    cfg = ExperimentConfig(
        model=ModelConfig(
            **mc, compute_dtype=args.dtype, message_impl=args.impl,
            pseudo_impl=args.pseudo_impl,
        ),
        data=DataConfig(batch_size=batch_size),
        train=TrainConfig(lr=8e-5, beta=0.05, gamma=25.0, grad_clip=0.01,
                          adam_moment_dtype=args.adam_dtype),
    )
    z, frames, bonds = synthetic_peptide(
        args.config, n_frames=max(64, 2 * batch_size), seed=0)
    mapping = newman_mapping(bonds, z.shape[0], cfg.model.n_cgs, seed=0)
    ds = build_dataset(
        mapping, frames, atom_cutoff=cfg.model.atom_cutoff,
        cg_cutoff=cfg.model.cg_cutoff, atomic_nums=z,
        bonds=bonds, order=2, rotate=True,
    )
    model = DenseCGVAE(cfg=cfg.model)
    trainer = Trainer(model, cfg, mesh=make_mesh(1))
    batch = ds.batch(np.arange(batch_size))
    state = trainer.init_state(batch, seed=0)
    rng = jax.random.PRNGKey(0)
    n, f = batch.z.shape[1], cfg.model.n_basis
    print(json.dumps({"label": "shape", "B": batch_size, "N": int(n),
                      "M": int(cfg.model.n_cgs), "F": f, "impl": args.impl,
                      "pseudo": args.pseudo_impl,
                      "backend": jax.devices()[0].platform}), flush=True)


    if "step" in which:
        # 1. full train step
        def full(c, k):
            st, r = c
            st, _ = trainer._train_step_impl(st, k, r)
            return st, jax.random.fold_in(r, 1)

        timed_scan(full, (state, rng), args.steps, "train_step_full",
                   batch_size, const=batch)

    if "layers" in which:
        # vary conv depths to get TRUE in-step per-layer costs (standalone
        # module benches exaggerate: no cross-module fusion/overlap)
        for enc, dec in [(2, 5), (4, 1), (0, 5), (4, 5)]:
            cfg2 = ExperimentConfig(
                model=ModelConfig(
                    n_cgs=3, n_basis=600, n_rbf=8, atom_cutoff=8.5,
                    cg_cutoff=9.5, enc_nconv=enc, dec_nconv=dec,
                    activation="swish", dec_type="pseudo", breaksym=True,
                    compute_dtype=args.dtype, message_impl=args.impl,
                    pseudo_impl=args.pseudo_impl,
                ),
                data=cfg.data, train=cfg.train,
            )
            model2 = DenseCGVAE(cfg=cfg2.model)
            tr2 = Trainer(model2, cfg2, mesh=make_mesh(1))
            st2 = tr2.init_state(batch, seed=0)

            def full2(c, k, _tr=tr2):
                st, r = c
                st, _ = _tr._train_step_impl(st, k, r)
                return st, jax.random.fold_in(r, 1)

            timed_scan(full2, (st2, rng), args.steps,
                       f"train_step_enc{enc}_dec{dec}", batch_size,
                       const=batch)

    if "parts" in which:
        # 2. value_and_grad only (no clip/adam/apply)
        def loss_fn(params, k, r):
            out = model.apply({"params": params}, k, rngs={"sample": r})
            loss, _ = vae_loss(out, flatten_batch(k), cfg.train.beta,
                               cfg.train.gamma)
            return loss

        def gradonly(c, k):
            params, r = c
            gr = jax.grad(loss_fn)(params, k, r)
            # fold grads back so iterations depend on each other
            params = jax.tree.map(lambda p_, g_: p_ + 0.0 * g_, params, gr)
            return params, jax.random.fold_in(r, 1)

        timed_scan(gradonly, (state.params, rng), args.steps, "value_and_grad",
                   batch_size, const=batch)

        # 3. forward + loss only
        def fwd(c, k):
            params, r, acc = c
            l_ = loss_fn(params, k, r)
            return params, jax.random.fold_in(r, 1), acc + l_

        timed_scan(fwd, (state.params, rng, jnp.zeros(())), args.steps,
                   "forward_loss", batch_size, const=batch)

    if "modules" in which:
        # ---- module-level: exact in-model shapes, fwd+bwd each
        from coarsegrainingvae_tpu.models.dense import (
            DenseFactoredEquiMessage,
            DenseUpdateBlock,
            dense_pairwise,
            radius_adjacency,
        )
        from coarsegrainingvae_tpu.models.dense_cgvae import (
            DenseContractive,
            DenseEquiMessagePseudo,
        )

        b, m = batch_size, cfg.model.n_cgs
        dt = jnp.dtype(args.dtype)
        key = jax.random.PRNGKey(1)
        xyz = jnp.asarray(batch.xyz)
        _, dist, unit = dense_pairwise(xyz)
        adj = radius_adjacency(dist, cfg.model.cg_cutoff, batch.atom_mask)
        _, cg_dist, cg_unit = dense_pairwise(jnp.asarray(batch.cg_xyz))
        dec_adj = radius_adjacency(cg_dist, cfg.model.atom_cutoff, batch.cg_mask)

        h = jax.random.normal(key, (b, n, f), jnp.float32)
        v = jax.random.normal(key, (b, n, 3, f), jnp.float32)
        H = jax.random.normal(key, (b, m, f), jnp.float32)
        V = jax.random.normal(key, (b, m, 3, f), jnp.float32)
        r_iI = jax.random.normal(key, (b, n, 3), jnp.float32)
        onehot = jax.nn.one_hot(jnp.asarray(batch.mapping), m)

        def bench_module(mod, inputs, label, count):
            params = mod.init(key, *inputs)

            def loss(p, x0):
                out = mod.apply(p, x0, *inputs[1:])
                return sum(jnp.sum(o**2) for o in jax.tree.leaves(out))

            def stepfn(c, k):
                p, x0 = c
                gp, gx = jax.grad(loss, argnums=(0, 1))(p, x0)
                p = jax.tree.map(lambda a, b_: a + 0.0 * b_, p, gp)
                return p, x0 + 0.0 * gx

            per = timed_scan(stepfn, (params, inputs[0]), args.steps,
                             f"{label} (x{count})")
            print(json.dumps({"label": label + "_total",
                              "ms": round(per * 1e3 * count, 2)}), flush=True)

        # encoder atom-graph message (enc_nconv=4 on atom graph)
        bench_module(
            DenseFactoredEquiMessage(feat_dim=f, activation="swish",
                                     n_rbf=8, cutoff=9.5, dtype=dt),
            (h, v, dist, unit, adj), "enc_factored_message", 4)
        # prior message (4 on CG graph, M=3)
        bench_module(
            DenseFactoredEquiMessage(feat_dim=f, activation="swish",
                                     n_rbf=8, cutoff=9.5, dtype=dt),
            (H, V, cg_dist, cg_unit, dec_adj), "prior_factored_message", 4)
        # update blocks: atoms (4) + CG (5 dec + 0 prior)
        bench_module(DenseUpdateBlock(feat_dim=f, activation="swish", dtype=dt),
                     (h, v), "update_atoms", 4)
        bench_module(DenseUpdateBlock(feat_dim=f, activation="swish", dtype=dt),
                     (H, V), "update_cg", 5)
        # contractive (4)
        bench_module(
            DenseContractive(feat_dim=f, activation="swish", n_rbf=8,
                             cutoff=cfg.model.contract_cutoff, dtype=dt),
            (h, v, r_iI, onehot), "enc_contractive", 4)
        # decoder pseudo message (5 on CG graph)
        Sbar = jnp.ones_like(H)
        Vbar = jnp.zeros_like(V)
        bench_module(
            DenseEquiMessagePseudo(feat_dim=f, activation="swish",
                                   n_rbf=8, cutoff=8.5, dtype=dt),
            (H, Sbar, V, Vbar, cg_dist, cg_unit, dec_adj),
            "dec_pseudo_message", 5)


if __name__ == "__main__":
    main()
