"""Position samplers for world-space training.

Rebuild of the reference samplers
(reference: applications/volnet/sampling.py:26-165): uniform random,
plastic (additive-recurrence low-discrepancy) and Halton sequences, each
producing positions in [0,1]^D. Random sampling uses jax.random (counter
based, so it IS deterministic per key, unlike the reference's np RNG);
plastic/halton are deterministic by index and computed with vectorized
numpy on the host (they feed the data pipeline, not the compute graph).
"""
from __future__ import annotations

import math
import sys

import jax
import numpy as np
from jax import Array

_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23]


def random_positions(key: Array, num_samples: int, dimension: int = 3):
    """Uniform random positions in [0,1]^D, (B, D) on device."""
    return jax.random.uniform(key, (num_samples, dimension))


def plastic_positions(num_samples: int, dimension: int = 3,
                      start_index: int = 0) -> np.ndarray:
    """Additive-recurrence sequence z_i = (0.5 + alpha*(i+1)) mod 1 with
    alpha from the generalized golden ratio
    (reference: sampling.py:38-65 ``PlasticSampler``)."""
    x = 1.0
    for _ in range(20):  # Newton for x^(d+1) = x + 1
        x = x - (x ** (dimension + 1) - x - 1) / (
            (dimension + 1) * x ** dimension - 1)
    alpha = np.asarray([(1 / x) ** (j + 1) % 1.0 for j in range(dimension)])
    i = np.arange(start_index, start_index + num_samples, dtype=np.float64)
    z = (0.5 + alpha[None, :] * (i[:, None] + 1.0)) % 1.0
    # keep strictly inside [0, 1) after the float32 round-trip
    return np.minimum(z.astype(np.float32), 1 - np.float32(2e-7))


def _radical_inverse_vec(a: np.ndarray, base: int,
                         perm: np.ndarray) -> np.ndarray:
    """Vectorized scrambled radical inverse
    (reference: sampling.py:76-89, vectorized over the index array)."""
    a = a.astype(np.int64).copy()
    inv_base = 1.0 / base
    reversed_digits = np.zeros_like(a)
    inv_base_n = np.ones(a.shape, np.float64)
    active = a > 0
    while active.any():
        nxt = a // base
        digit = a - nxt * base
        reversed_digits = np.where(active,
                                   reversed_digits * base + perm[digit],
                                   reversed_digits)
        inv_base_n = np.where(active, inv_base_n * inv_base, inv_base_n)
        a = nxt
        active = a > 0
    vals = inv_base_n * (reversed_digits + inv_base * perm[0] / (1 - inv_base))
    return np.minimum(vals, 1 - sys.float_info.epsilon)


def halton_positions(num_samples: int, dimension: int = 3,
                     start_index: int = 0, seed: int = 0) -> np.ndarray:
    """Scrambled Halton sequence (reference: sampling.py:67-98)."""
    rng = np.random.default_rng(seed)
    idx = np.arange(start_index, start_index + num_samples)
    out = np.empty((num_samples, dimension), np.float32)
    for d in range(dimension):
        base = _PRIMES[d]
        perm = np.arange(base)
        rng.shuffle(perm)
        out[:, d] = _radical_inverse_vec(idx, base, perm)
    return np.minimum(out, 1 - np.float32(2e-7))


def get_sampled_positions(sampler: str, num_samples: int, dimension: int = 3,
                          start_index: int = 0, key=None) -> np.ndarray:
    """Dispatcher mirroring ``get_sampled_positions``
    (reference: sampling.py:99-165, without the npy cache)."""
    if sampler == "random":
        if key is None:
            key = jax.random.PRNGKey(start_index)
        return np.asarray(random_positions(key, num_samples, dimension))
    if sampler == "plastic":
        return plastic_positions(num_samples, dimension, start_index)
    if sampler == "halton":
        return halton_positions(num_samples, dimension, start_index)
    raise ValueError(f"unknown sampler {sampler}")
