"""Test harness: force CPU with 8 virtual devices so sharding/mesh tests run
without TPU hardware (the 'distributed test without a cluster' pattern,
SURVEY.md section 4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the environment's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: re-runs (and xdist workers) reuse
# compiled programs instead of recompiling every jitted step per process
_cache_dir = os.environ.get(
    "COARSEGRAININGVAE_TEST_CACHE", "/tmp/cgvae_tpu_xla_cache"
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_dataset():
    """Tiny synthetic dipeptide-like dataset shared across tests."""
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.data.dataset import build_dataset
    from coarsegrainingvae_tpu.data.mappings import newman_mapping

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=32, seed=7)
    mapping = newman_mapping(bonds, z.shape[0], 3, seed=0)
    ds = build_dataset(
        mapping, frames, atom_cutoff=8.5, cg_cutoff=9.5, atomic_nums=z,
        bonds=bonds, order=2, rotate=True, seed=5,
    )
    return ds


@pytest.fixture(scope="session")
def tiny_model_cfg():
    from coarsegrainingvae_tpu.config import ModelConfig

    return ModelConfig(
        n_cgs=3, n_basis=32, n_rbf=5, atom_cutoff=8.5, cg_cutoff=9.5,
        enc_nconv=2, dec_nconv=2, activation="swish", dec_type="pseudo",
        breaksym=True,
    )
