"""Kernel-vs-XLA shape table: the fused Pallas kernels against their best
XLA formulations, fwd+bwd, at the shapes that matter (DESIGN.md table).

- pseudo message (ops/pallas_pseudo.py vs the channel-stacked XLA form):
  M = 3 (dipeptide flagship), 6 (chignolin), 100/300 (PCN-scale CG graphs)
- factored message (ops/pallas_message.py vs the einsum XLA form):
  N = 27 (dipeptide atoms), 209 (chignolin atoms), 500

Each measurement is a jitted lax.scan of fwd+VJP steps (iterations chained
through the carry), synced by jax.device_get -- same discipline as
profile_flagship.py. Prints one JSON line per (kernel, shape, impl).

Usage:  python examples/profile_kernels.py [--steps 30] [--batch 8]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, n_steps, label):
    @jax.jit
    def run(a):
        def body(c, _):
            out = fn(*c[1:])
            # fold the output back into the first arg so steps serialize
            lead = c[0] + 1e-20 * out
            return (lead,) + c[1:], ()

        c, _ = jax.lax.scan(body, a, None, length=n_steps)
        return c[0]

    try:
        out = run(args)
        jax.device_get(out)
        t0 = time.perf_counter()
        jax.device_get(run(args))
        dt = (time.perf_counter() - t0) / n_steps * 1e3
        print(json.dumps({"label": label, "ms_per_step": round(dt, 3)}),
              flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 - infeasible shape IS the result
        print(json.dumps({"label": label,
                          "error": repr(e)[:160]}), flush=True)
        return float("nan")


def bench_pseudo(b, m, f, n_rbf, cutoff, steps, interpret):
    from coarsegrainingvae_tpu.ops.pallas_pseudo import (
        fused_pseudo_message,
        pseudo_reference,
    )

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32) * 3)
    mask = jnp.ones((b, m), jnp.float32)
    phi = jnp.asarray(rng.normal(size=(b, m, 9, f)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(b, m, f)).astype(np.float32))
    sbar = jnp.ones_like(s)
    v = jnp.asarray(rng.normal(size=(b, m, 3, f)).astype(np.float32))
    vbar = jnp.zeros_like(v)
    w = jnp.asarray(rng.normal(size=(n_rbf + 1, 9, f)).astype(np.float32) * 0.1)

    def make(fn):
        def step(xyz_, phi_, s_, sbar_, v_, vbar_, w_):
            def loss(p, w2):
                outs = fn(xyz_, mask, p, s_, sbar_, v_, vbar_, w2)
                return sum(jnp.sum(o * o) for o in outs)

            l, (gp, gw) = jax.value_and_grad(loss, argnums=(0, 1))(phi_, w_)
            return l + jnp.sum(gp) + jnp.sum(gw)

        return step

    tile_b = 8 if m <= 16 else 1
    ref = make(lambda *a: pseudo_reference(*a, cutoff, n_rbf))
    args = (jnp.zeros(()), xyz, phi, s, sbar, v, vbar, w)
    timed(ref, args, steps, f"pseudo_xla_B{b}_M{m}_F{f}")
    # static VMEM bound: the kernel holds a (tile_b, M, M, 9F) filter tile
    # in VMEM; past the 16 MB scoped limit the Mosaic compile is KILLED
    # after minutes (observed on-chip), so shapes over budget are reported
    # infeasible instead of attempted
    filt_mb = tile_b * m * m * 9 * f * 4 / 2**20
    if filt_mb > 12.0:
        print(json.dumps({
            "label": f"pseudo_pallas_B{b}_M{m}_F{f}",
            "skipped": f"VMEM-infeasible: filter tile {filt_mb:.0f} MB "
                       "> 16 MB scoped VMEM (small-M kernel by design; "
                       "use the stacked XLA form at this shape)",
        }), flush=True)
        return
    pallas = make(lambda *a: fused_pseudo_message(
        *a, cutoff, n_rbf, tile_b, interpret))
    timed(pallas, args, steps, f"pseudo_pallas_B{b}_M{m}_F{f}")


def bench_message(b, n, f, n_rbf, cutoff, steps, interpret):
    from coarsegrainingvae_tpu.ops.pallas_message import (
        fused_message,
        message_reference,
    )

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32) * 4)
    mask = jnp.ones((b, n), jnp.float32)
    phi = jnp.asarray(rng.normal(size=(b, n, 4, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, 3, f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n_rbf + 1, 4, f)).astype(np.float32) * 0.1)

    def make(fn):
        def step(xyz_, phi_, v_, w_):
            def loss(p, w2):
                ds, dv = fn(xyz_, mask, p, v_, w2)
                return jnp.sum(ds * ds) + jnp.sum(dv * dv)

            l, (gp, gw) = jax.value_and_grad(loss, argnums=(0, 1))(phi_, w_)
            return l + jnp.sum(gp) + jnp.sum(gw)

        return step

    from coarsegrainingvae_tpu.ops.pallas_message import message_vmem_mb

    ref = make(lambda *a: message_reference(*a, cutoff, n_rbf))
    args = (jnp.zeros(()), xyz, phi, v, w)
    timed(ref, args, steps, f"message_xla_B{b}_N{n}_F{f}")
    # same discipline as the pseudo kernel: whole-node feature blocks live
    # in VMEM, so past the scoped budget the Mosaic compile fails after
    # minutes -- report infeasible instead of attempting
    vmem = message_vmem_mb(n, 4, f, n_rbf)
    if vmem > 12.0:
        print(json.dumps({
            "label": f"message_pallas_B{b}_N{n}_F{f}",
            "skipped": f"VMEM-infeasible: node blocks {vmem:.0f} MB "
                       "> 16 MB scoped VMEM (whole-graph-in-VMEM kernel "
                       "by design; use the einsum XLA form at this N)",
        }), flush=True)
        return
    pallas = make(lambda *a: fused_message(*a, cutoff, n_rbf, 8, interpret))
    timed(pallas, args, steps, f"message_pallas_B{b}_N{n}_F{f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--f", type=int, default=600)
    args = p.parse_args()

    from coarsegrainingvae_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    interpret = jax.devices()[0].platform != "tpu"
    print(json.dumps({"backend": jax.devices()[0].platform}), flush=True)

    # pseudo kernel: flagship M=3 (batch 32), chignolin M=6 (batch 16),
    # PCN-scale M=100/300 (batch 4/1)
    for b, m in ((32, 3), (16, 6), (4, 100), (1, 300)):
        bench_pseudo(b, m, args.f, 8, 21.0, args.steps, interpret)
    # factored message: dipeptide N=27, chignolin N=209, spike-slice N=500
    for b, n in ((32, 27), (8, 209), (2, 500)):
        bench_message(b, n, args.f, 8, 9.5, args.steps, interpret)


if __name__ == "__main__":
    main()
