"""SRN activation functions (forward; JAX supplies the adjoints).

Rebuild of the activation zoo used by the SRN
(reference: applications/volnet/network.py:240-262 ``CustomActivations`` and
the device fwd+adjoint pairs in renderer/renderer_activations.cuh:25-423).
The fused Pallas kernels reuse these formulas on bf16/f32 tiles; their
hand-written adjoints mirror the ``adjoint`` halves of the reference.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array


def _relu(x: Array, p: float) -> Array:
    return jnp.maximum(x, 0.0)


def _sine(x: Array, p: float) -> Array:
    return jnp.sin(p * x)


def _sigmoid(x: Array, p: float) -> Array:
    return jax.nn.sigmoid(x)


def _softplus(x: Array, p: float) -> Array:
    return jax.nn.softplus(x)


def _snake(x: Array, p: float) -> Array:
    # x + sin^2(f x)/f (reference: network.py:248-253, renderer_activations.cuh)
    return x + jnp.sin(p * x) ** 2 / p


def _snake_alt(x: Array, p: float) -> Array:
    # (x + 1 - cos(2 f x)) / (2 f) (reference: network.py:255-262)
    return (x + 1.0 - jnp.cos(2.0 * p * x)) / (2.0 * p)


def _none(x: Array, p: float) -> Array:
    return x


ACTIVATIONS: dict[str, Callable[[Array, float], Array]] = {
    "ReLU": _relu,
    "Sine": _sine,
    "Sigmoid": _sigmoid,
    "Softplus": _softplus,
    "Snake": _snake,
    "SnakeAlt": _snake_alt,
    "None": _none,
    "NONE": _none,
}


def apply_activation(name: str, x: Array, param: float = 1.0) -> Array:
    return ACTIVATIONS[name](x, param)


def parse_activation(spec: str) -> tuple[str, float]:
    """'SnakeAlt:2' -> ('SnakeAlt', 2.0)
    (reference: network.py:346-349 activation spec parsing)."""
    parts = spec.split(":")
    name = parts[0]
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation {name}")
    param = float(parts[1]) if len(parts) > 1 else 1.0
    return name, param
