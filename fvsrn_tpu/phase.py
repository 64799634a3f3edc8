"""Phase functions for volumetric path tracing.

Rebuild of the reference phase functions
(reference: renderer/phase_function.h:26-72 and
renderer/renderer_phase_function.cuh): Henyey-Greenstein and Rayleigh,
each with ``prob`` (pdf over directions), ``sample_angle`` (importance-sample
cos(theta)) and ``sample`` (full direction via an orthonormal frame).

All functions are vectorized over rays (last axis = xyz) and take explicit
``jax.random`` keys in place of the reference's cuRAND per-thread sampler
(renderer_sampler_curand.cuh) -- counter-based keys make multi-chip runs
reproducible regardless of sharding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .utils.pytree import static_field, struct
from .utils.vecmath import cross, dot

_1_4PI = 0.07957747154594767


def cos_angle(dir_in: Array, dir_out: Array) -> Array:
    """(reference: PhaseFunctionHelpers::getCosAngle)"""
    return dot(-dir_in, dir_out)[..., 0]


def direction_from_angle(dir_in: Array, cos_theta: Array,
                         u_phi: Array) -> Array:
    """Build an outgoing direction with given cos(angle) to -dir_in and
    uniform azimuth u_phi in [0,1)
    (reference: PhaseFunctionHelpers::directionFromAngle, pbr-book frame)."""
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta ** 2))
    phi = 2 * jnp.pi * u_phi
    v1 = -dir_in
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    use_x = jnp.abs(x) > jnp.abs(y)
    inv_a = 1.0 / jnp.sqrt(jnp.where(use_x, x * x + z * z, y * y + z * z))
    v2 = jnp.where(
        use_x[..., None],
        jnp.stack([-z, jnp.zeros_like(z), x], axis=-1),
        jnp.stack([jnp.zeros_like(z), z, -y], axis=-1)) * inv_a[..., None]
    v3 = cross(v1, v2)
    return (sin_theta * jnp.cos(phi))[..., None] * v2 \
        + (sin_theta * jnp.sin(phi))[..., None] * v3 \
        + cos_theta[..., None] * v1


@struct
class PhaseFunctionHenyeyGreenstein:
    """HG phase function; note the reference's convention
    p(cos) = 1/4pi (1-g^2)/(1+g^2+2g cos)^{3/2} with cos measured via
    getCosAngle (reference: renderer_phase_function.cuh:77-118)."""
    g: Array = None

    @classmethod
    def make(cls, g: float = 0.0):
        return cls(g=np.float32(g))

    def _g(self, b: int) -> Array:
        g = jnp.asarray(self.g)
        return g[b] if g.ndim > 0 else g

    def prob_angle(self, cos_theta: Array, pos=None, b: int = 0) -> Array:
        g = self._g(b)
        denom = 1 + g * g + 2 * g * cos_theta
        return _1_4PI * (1 - g * g) / (denom * jnp.sqrt(denom))

    def prob(self, dir_in: Array, dir_out: Array, pos=None,
             b: int = 0) -> Array:
        return self.prob_angle(cos_angle(dir_in, dir_out), pos, b)

    def sample_angle(self, u: Array, b: int = 0) -> Array:
        g = self._g(b)
        sqr_term = (1 - g * g) / (1 - g + 2 * g * u)
        cos_iso = 1 - 2 * u
        cos_g = (1 + g * g - sqr_term ** 2) / (2 * g)
        cos_theta = jnp.where(jnp.abs(g) < 1e-3, cos_iso, cos_g)
        return -cos_theta

    def sample(self, key: Array, dir_in: Array, pos=None,
               b: int = 0, u: Array = None, u_phi: Array = None) -> Array:
        if u is None or u_phi is None:
            k1, k2 = jax.random.split(key)
            shape = dir_in.shape[:-1]
            u = jax.random.uniform(k1, shape)
            u_phi = jax.random.uniform(k2, shape)
        return direction_from_angle(dir_in, self.sample_angle(u, b), u_phi)


@struct
class PhaseFunctionRayleigh:
    """Rayleigh scattering (reference: renderer_phase_function.cuh:121-160,
    analytic cdf inversion via Cardano)."""
    _dummy: Array = None

    @classmethod
    def make(cls):
        return cls(_dummy=np.zeros((), np.float32))

    def prob_angle(self, cos_theta: Array, pos=None, b: int = 0) -> Array:
        return _1_4PI * 0.75 * (1 + cos_theta ** 2)

    def prob(self, dir_in: Array, dir_out: Array, pos=None,
             b: int = 0) -> Array:
        return self.prob_angle(cos_angle(dir_in, dir_out), pos, b)

    def sample_angle(self, u: Array, b: int = 0) -> Array:
        z = 4 * u - 2
        z2 = jnp.sqrt(z * z + 1)
        a = jnp.cbrt(z + z2)
        b_ = jnp.cbrt(z - z2)
        return a + b_

    def sample(self, key: Array, dir_in: Array, pos=None,
               b: int = 0, u: Array = None, u_phi: Array = None) -> Array:
        if u is None or u_phi is None:
            k1, k2 = jax.random.split(key)
            shape = dir_in.shape[:-1]
            u = jax.random.uniform(k1, shape)
            u_phi = jax.random.uniform(k2, shape)
        return direction_from_angle(dir_in, self.sample_angle(u, b), u_phi)
