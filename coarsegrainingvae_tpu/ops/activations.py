"""Activation registry.

Parity with the reference registry (modules.py:32-42 in /root/reference),
expressed as pure jnp functions (XLA fuses these into neighbouring matmuls).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

_LN2 = math.log(2.0)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (modules.py:16-21)."""
    return x * jax.nn.sigmoid(x)


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x) - ln 2 (modules.py:8-14)."""
    return jax.nn.softplus(x) - _LN2


_ACTIVATIONS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "linear": lambda x: x,
    "Tanh": jnp.tanh,
    "tanh": jnp.tanh,
    "ReLU": jax.nn.relu,
    "relu": jax.nn.relu,
    "shifted_softplus": shifted_softplus,
    "sigmoid": jax.nn.sigmoid,
    "LeakyReLU": jax.nn.leaky_relu,
    "ELU": jax.nn.elu,
    "swish": swish,
}


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name not in _ACTIVATIONS:
        raise KeyError(f"unknown activation {name!r}; have {sorted(_ACTIVATIONS)}")
    return _ACTIVATIONS[name]
