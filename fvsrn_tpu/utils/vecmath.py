"""Vector math helpers shared across modules.

TPU-native replacements for the reference's device-side helpers
(reference: renderer/helper_math.cuh, renderer/renderer_utils.cuh:329-368
``intersectionRayAABB``). Everything operates on arrays whose *last* axis is
the xyz component axis so the code vmaps/shards cleanly over leading axes.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def dot(a: Array, b: Array, keepdims: bool = True) -> Array:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v: Array, keepdims: bool = True) -> Array:
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=keepdims))


def normalize(v: Array, eps: float = 0.0) -> Array:
    """Normalize along the last axis. eps=0 matches the reference's plain
    ``normalize`` (may produce inf for zero vectors)."""
    n = length(v)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def safe_normalize(v: Array) -> Array:
    """Reference ``safeNormalize`` (renderer/renderer_utils.cuh): returns 0
    for (near-)zero vectors instead of NaN."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, 1e-20))
    return jnp.where(n2 > 1e-12, v / n, jnp.zeros_like(v))


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def intersect_aabb(ray_start: Array, ray_dir: Array,
                   box_min: Array, box_size: Array) -> tuple[Array, Array]:
    """Ray/AABB intersection (slab method).

    Matches ``Raytracing.intersection_aabb``
    (reference: applications/volnet/raytracing.py:79-92) and the device
    ``intersectionRayAABB``. All inputs broadcast; component axis is last.

    Returns (tmin, tmax), each of shape (..., 1) (keepdims over the
    component axis, like the reference's (B, 1) tensors).
    """
    inv_dir = 1.0 / ray_dir
    t135 = (box_min - ray_start) * inv_dir
    t246 = (box_min + box_size - ray_start) * inv_dir
    tmin = jnp.max(jnp.minimum(t135, t246), axis=-1, keepdims=True)
    tmax = jnp.min(jnp.maximum(t135, t246), axis=-1, keepdims=True)
    return tmin, tmax


def lerp(a: Array, b: Array, t: Array) -> Array:
    return a + (b - a) * t


def fibonacci_sphere(n: int) -> "jnp.ndarray":
    """N nearly-uniform directions on the unit sphere (golden-angle spiral).

    Mirrors ``fibonacci_sphere`` (reference: applications/common/utils.py),
    used for screen-space training camera placement.
    """
    import numpy as np

    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    golden = np.pi * (1 + 5 ** 0.5)
    theta = golden * i
    xyz = np.stack([
        np.cos(theta) * np.sin(phi),
        np.sin(theta) * np.sin(phi),
        np.cos(phi),
    ], axis=-1)
    return jnp.asarray(xyz, dtype=jnp.float32)
