"""Learned CG mapping (`cg_method='cgae'`).

TPU-native rebuild of the reference's tiny mapping autoencoder
(cgae.py:8-33 in /root/reference) and its training loop `learn_map`
(datasets.py:190-249): a trainable (n_atoms, n_cgs) assignment-logit matrix
encodes atoms to beads via gumbel-softmax; a (n_cgs, n_atoms) linear decoder
maps bead coordinates back to atoms. Loss = reconstruction MSE + reg * MSE of
atoms against their (soft-)assigned bead centers; tau anneals linearly
1.0 -> 0.025 at 0.001/step; Adam lr 4e-3, 1500 steps. The hard mapping is
``argmax`` of the learned logits.

Instead of a 1500-iteration Python loop with per-epoch host sync, the whole
optimization is ONE ``lax.scan`` inside one jit: the frames live on device
for the duration, tau is computed from the step index, and only the final
logits come back to host.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jnp.ndarray


class CGaeParams(NamedTuple):
    assign_logits: Array  # (n_atoms, n_cgs)
    decode: Array         # (n_atoms, n_cgs) linear lift: x_rec = decode @ cg_xyz


def gumbel_softmax(
    rng: jax.Array, logits: Array, tau: Array, hard: bool = False
) -> Array:
    """Gumbel-softmax sample along the last axis (torch F.gumbel_softmax
    semantics used by cgae.py:21-33 and CGpool, diffpoolvae.py:105-195)."""
    u = jax.random.uniform(rng, logits.shape, minval=1e-10, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
        y = y_hard - jax.lax.stop_gradient(y) + y  # straight-through
    return y


def cgae_forward(
    params: CGaeParams, xyz: Array, rng: jax.Array, tau: Array
) -> Tuple[Array, Array, Array]:
    """One autoencoding pass over a batch of frames.

    xyz: (B, N, 3) mean-centered coordinates.
    Returns (x_recon, cg_xyz, M) with M the (B, N, K) soft assignment.
    """
    b = xyz.shape[0]
    m = gumbel_softmax(
        rng, jnp.broadcast_to(params.assign_logits, (b,) + params.assign_logits.shape),
        tau,
    )
    # bead coords = assignment-weighted atom mean (cgae.py:25-28)
    weights = m / (jnp.sum(m, axis=1, keepdims=True) + 1e-8)
    cg_xyz = jnp.einsum("bnk,bnd->bkd", weights, xyz)
    x_recon = jnp.einsum("nk,bkd->bnd", params.decode, cg_xyz)
    return x_recon, cg_xyz, m


def learn_map(
    frames: np.ndarray,
    n_cgs: int,
    n_steps: int = 1500,
    lr: float = 4e-3,
    batch_size: int = 32,
    tau_start: float = 1.0,
    tau_min: float = 0.025,
    tau_rate: float = 0.001,
    reg: float = 1.0,
    seed: int = 0,
    max_frames: int = 2000,
) -> np.ndarray:
    """Train the mapping autoencoder and return the hard (N,) mapping.

    Mirrors datasets.py:190-249: tau = max(tau_start - tau_rate*step,
    tau_min); Adam(lr=4e-3); loss = MSE(x_recon, x) + reg * MSE(x, M@cg_xyz);
    mapping = argmax of assignment logits, relabeled to consecutive ids by
    first occurrence. The reference retries on degenerate mappings at the
    call site (run_ala.py:170-174); here degenerate beads are impossible by
    relabeling, but callers should still check bead counts.
    """
    frames = np.asarray(frames, dtype=np.float32)[:max_frames]
    frames = frames - frames.mean(axis=1, keepdims=True)
    f, n, _ = frames.shape
    batch_size = min(batch_size, f)

    rng = jax.random.PRNGKey(seed)
    k_init, k_scan = jax.random.split(rng)
    params = CGaeParams(
        assign_logits=jax.random.normal(k_init, (n, n_cgs)) * 0.1,
        decode=jax.random.normal(jax.random.fold_in(k_init, 1), (n, n_cgs))
        * (1.0 / np.sqrt(n_cgs)),
    )
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    data = jnp.asarray(frames)

    def loss_fn(p: CGaeParams, batch: Array, key: jax.Array, tau: Array):
        x_recon, cg_xyz, m = cgae_forward(p, batch, key, tau)
        recon = jnp.mean((x_recon - batch) ** 2)
        # shift regularizer: atoms close to their assigned bead center
        lifted = jnp.einsum("bnk,bkd->bnd", m, cg_xyz)
        shift = jnp.mean((lifted - batch) ** 2)
        return recon + reg * shift

    @jax.jit
    def run(params, opt_state, key):
        def step(carry, i):
            p, o = carry
            k = jax.random.fold_in(key, i)
            tau = jnp.maximum(tau_start - tau_rate * i.astype(jnp.float32), tau_min)
            idx = jax.random.randint(jax.random.fold_in(k, 1), (batch_size,), 0, f)
            batch = jnp.take(data, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(p, batch, k, tau)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss
        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_steps)
        )
        return params, losses

    params, _ = run(params, opt_state, k_scan)
    raw = np.asarray(jax.device_get(params.assign_logits)).argmax(-1)

    # relabel to consecutive bead ids ordered by first occurrence
    remap: dict = {}
    out = np.empty(n, dtype=np.int32)
    for i, l in enumerate(raw):
        if l not in remap:
            remap[l] = len(remap)
        out[i] = remap[l]
    return out
