"""Segment reductions: the TPU-native replacement for torch_scatter.

The reference's only compiled-native dependency is torch_scatter's
scatter_add/scatter_mean CUDA kernels (requirements.txt:18, conv.py:7 in
/root/reference). On TPU these become `jax.ops.segment_sum` over fixed-size
edge arrays with a **static** number of segments, which XLA lowers to an
efficient one-pass scatter. Masked (padding) edges simply carry zero payload.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """scatter_add equivalent (conv.py:119-127 etc. in the reference).

    Args:
      data: (E, ...) per-edge payload.
      segment_ids: (E,) int32 destination ids in [0, num_segments).
      num_segments: static segment count.
      mask: optional (E,) bool/float; masked-out rows contribute zero.
      indices_are_sorted: pass True when edges were receiver-sorted on host
        (data/neighbors.py sorts at build time) -- XLA TPU lowers unsorted
        scatter-adds to a serialized update loop, so this flag is a large
        speedup on the message-passing hot path.
    """
    if mask is not None:
        m = mask.astype(data.dtype)
        data = data * m.reshape(m.shape + (1,) * (data.ndim - m.ndim))
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """scatter_mean equivalent (e.g. cgvae.py:296-298,479 in the reference).

    Empty segments return 0 rather than NaN.
    """
    total = segment_sum(data, segment_ids, num_segments, mask)
    if mask is not None:
        ones = mask.astype(data.dtype)
    else:
        ones = jnp.ones(segment_ids.shape, dtype=data.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    counts = counts.reshape(counts.shape + (1,) * (data.ndim - 1))
    return total / jnp.maximum(counts, eps)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable per-segment softmax (for attention-style weights).

    Not in the reference's live path (its attention code is commented out,
    conv.py:536-551) but part of the op library.
    """
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    maxes = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    shifted = logits - maxes[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask, exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-12)
