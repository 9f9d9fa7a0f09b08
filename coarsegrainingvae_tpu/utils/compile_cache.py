"""Persistent XLA compilation cache.

TPU compiles of the full train step run minutes on first trace; enabling
jax's persistent cache makes every subsequent process start warm. Called by
bench.py and the CLI drivers; safe to call multiple times.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "COARSEGRAININGVAE_XLA_CACHE", "/tmp/cgvae_tpu_xla_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
