"""BRDF / local shading.

Rebuild of ``BRDFLambert`` (reference: renderer/brdf.h:20-66 and
renderer/renderer_brdf_lambert.cuh:55-105): optional gradient-magnitude
opacity scaling and Blinn-Phong-style shading with a point or directional
light. The default configuration (all features off) is a passthrough, which
matches the reference's default module state.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array

from .utils.pytree import static_field, struct
from .utils.vecmath import dot, normalize, safe_normalize

LIGHT_POINT = "point"
LIGHT_DIRECTION = "direction"


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _reflect(i, n):
    return i - 2.0 * dot(n, i) * n


@struct
class BRDFLambert:
    magnitude_scaling: Array = None     # scalar
    ambient: Array = None               # scalar
    specular: Array = None              # scalar
    magnitude_center: Array = None      # scalar
    magnitude_radius: Array = None      # scalar
    light_parameter: Array = None       # (3,) direction or position
    specular_exponent: int = static_field(default=8)
    enable_magnitude_scaling: bool = static_field(default=False)
    enable_phong: bool = static_field(default=False)
    light_type: str = static_field(default=LIGHT_DIRECTION)

    @classmethod
    def make(cls, enable_phong=False, enable_magnitude_scaling=False,
             magnitude_scaling=1.0, ambient=0.1, specular=0.1,
             magnitude_center=0.5, magnitude_radius=0.1,
             light=(0.0, 0.0, -1.0), light_type=LIGHT_DIRECTION,
             specular_exponent=8):
        f32 = lambda v: np.asarray(v, np.float32)
        return cls(
            magnitude_scaling=f32(magnitude_scaling), ambient=f32(ambient),
            specular=f32(specular), magnitude_center=f32(magnitude_center),
            magnitude_radius=f32(magnitude_radius),
            light_parameter=f32(light), specular_exponent=specular_exponent,
            enable_magnitude_scaling=enable_magnitude_scaling,
            enable_phong=enable_phong, light_type=light_type,
        )

    def eval(self, rgb_absorption: Array, position: Array,
             gradient: Array, ray_dir: Array, b: int = 0) -> Array:
        """(..., 4) color+absorption -> shaded (..., 4)
        (reference: renderer_brdf_lambert.cuh:55-105)."""
        if not (self.enable_phong or self.enable_magnitude_scaling):
            return rgb_absorption
        rgb = rgb_absorption[..., :3]
        absorption = rgb_absorption[..., 3:4]
        grad_norm_sqr = jnp.sum(gradient * gradient, axis=-1, keepdims=True)
        normal = safe_normalize(gradient)

        if self.enable_magnitude_scaling:
            absorption = absorption * (
                1.0 - jnp.exp(-self.magnitude_scaling * grad_norm_sqr))

        if self.enable_phong:
            if self.light_type == LIGHT_DIRECTION:
                light_dir = normalize(-self.light_parameter)
                light_dir = jnp.broadcast_to(light_dir, normal.shape)
            else:
                light_dir = normalize(self.light_parameter - position)
            grad_norm = jnp.sqrt(jnp.maximum(grad_norm_sqr, 1e-20))
            phong = _smoothstep(self.magnitude_center - self.magnitude_radius,
                                self.magnitude_center + self.magnitude_radius,
                                grad_norm)
            ambient_strength = 1.0 + (self.ambient - 1.0) * phong
            diffuse = jnp.abs(dot(normal, light_dir)) * rgb
            spec_e = float(self.specular_exponent)
            specular = ((spec_e + 2) * 0.159155) * jnp.maximum(
                0.0, dot(ray_dir, _reflect(light_dir, -normal))) ** spec_e
            rgb = (ambient_strength * rgb
                   + (1.0 - ambient_strength)
                   * (diffuse + self.specular * specular))
        return jnp.concatenate([rgb, absorption], axis=-1)
