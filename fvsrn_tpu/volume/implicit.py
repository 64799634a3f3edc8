"""Analytic (implicit) density fields.

Mesh-free, file-free ground truth for tests and benchmarks, re-implementing
the reference's implicit dataset generators
(reference: renderer/volume_implicit.cpp:32-230, enum
``Volume::ImplicitEquation`` renderer/volume.h:437-459) as pure JAX functions.
Each equation maps world xyz inside its source box to a density; sampling a
grid through :func:`create_implicit_grid` mirrors
``Volume::createSyntheticDataset`` (reference: renderer/volume.cpp:870-891):
voxel x samples world coordinate boxMin + x * (boxMax-boxMin)/(res-1).
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct


def _sqr(x):
    return x * x


def _cb(x):
    return x * x * x


def _implicit2density(i):
    """Implicit surfaces cross zero at the surface; map to density 0.5 and
    clamp (reference: volume_implicit.cpp:84-89)."""
    return jnp.clip(-i + 0.5, 0.0, 1.0)


def marschner_lobb(x, y, z, fM=6.0, alpha=0.25):
    r = jnp.sqrt(x * x + y * y)
    pr = jnp.cos(2 * jnp.pi * fM * jnp.cos(jnp.pi * r / 2))
    num = (1 - jnp.sin(jnp.pi * z / 2)) + alpha * (1 + pr)
    return num / (2 * (1 + alpha))


def cube(x, y, z, scale=0.5):
    d = jnp.sqrt(_sqr(jnp.maximum(0.0, jnp.abs(x) - scale))
                 + _sqr(jnp.maximum(0.0, jnp.abs(y) - scale))
                 + _sqr(jnp.maximum(0.0, jnp.abs(z) - scale)))
    return 1 - d


def sphere(x, y, z):
    return 1 - jnp.sqrt(x * x + y * y + z * z)


def inverse_sphere(x, y, z):
    return jnp.sqrt(x * x + y * y + z * z)


def ding_dong(x, y, z):
    return _implicit2density(x * x + y * y - z * (1 - z * z))


def endrass(x, y, z):
    s2 = math.sqrt(2.0)
    a = _sqr(x + y) - 2
    b = _sqr(x - y) - 2
    c = -4 * (1 - s2)
    d = 8 * (2 - s2) * z * z + 2 * (2 - 7 * s2) * (x * x + y * y)
    e = -16 * _sqr(_sqr(z)) + 8 * (1 + 2 * s2) * _sqr(z) - 1 + 12 * s2
    return 0.5 + (64 * (x * x - 1) * (y * y - 1) * a * b - _sqr(c + d + e))


def barth(x, y, z):
    z = z + 0.5
    phi = (1 + math.sqrt(5.0)) / 2
    x2, y2, z2, phi2 = x * x, y * y, z * 2, phi * phi
    return 0.5 + (4 * (phi2 * x2 - y2) * (phi2 * y2 - z2) * (phi2 * z2 - x2)
                  - (1 + 2 * phi) * _sqr(x2 + y2 + z2 - 1))


def heart(x, y, z):
    x2, y2, z2 = x * x, y * y, z * 2
    return _implicit2density(_cb(2 * x2 + 2 * y2 + z2 - 1)
                             - 0.1 * x2 * z2 * z - y2 * z2 * z)


def kleine(x, y, z):
    x2, y2, z2 = 25 * x * x, 25 * y * y, 5 * z * 2
    return 0.5 - ((x2 + y2 + z2 + 10 * y - 1) * _sqr(x2 + y2 + z2 - 10 * y - 1)
                  - 8 * z2 + 400 * x * y * (x2 + y2 + z2 - 10 * y - 1))


def cassini(x, y, z, a=0.25):
    return _implicit2density((_sqr(x + a) + y * y) * (_sqr(x - a) + y * y)
                             - z * z)


def steiner(x, y, z):
    x2, y2, z2 = x * x, y * y, z * 2
    return _implicit2density(x2 * y2 + x2 * z2 + y2 * z2 - 2 * x * y * z)


def cross_cap(x, y, z):
    x2, y2, z2 = x * x, y * y, z * 2
    return _implicit2density(4 * x2 * (x2 + y2 * z2 + z)
                             + y2 * (y2 + z2 - 1))


def kummer(x, y, z):
    x2, y2, z2 = x * x, y * y, z * 2
    return _implicit2density(x2 * x2 + y2 * y2 + z2 * z2 - x2 - y2 - z2
                             - x2 * y2 - y2 * z2 - z2 * x2 + 1)


def blobby(x, y, z):
    x2, y2, z2 = x * x, y * y, z * 2
    return _implicit2density(x2 + y2 * z2 + jnp.sin(4 * x) - jnp.cos(4 * y)
                             + jnp.sin(4 * z) - 1)


def tube(x, y, z):
    r = jnp.sqrt(y * y + z * z)
    return ((1 - (r * _cb(0.9 - 0.5 * jnp.cos(7 * x)))) - 0.9) * 10


def multi_shell(x, y, z):
    """Sparse-scene synthetic: three thin concentric shells with angular
    holes and a radial ripple. NOT in the reference's equation set -- built
    for the sparse-TF scene class its headline figures live on (Ejecta-like
    occupancy: ~16% of the volume above density 0.3, ~11% above 0.45), so
    zero-opacity-band TFs leave most (tile, segment) programs cullable
    (reference regime: renderer_ray_evaluation_stepping_dvr.cuh:84-154
    early-outs on config-files/*.json TFs with zero bands)."""
    ripple = 0.03 * jnp.sin(4.0 * x) * jnp.sin(5.0 * y) * jnp.sin(6.0 * z)
    r = jnp.sqrt(x * x + y * y + z * z) + 1e-6 + ripple
    az = jnp.arctan2(y, x)
    el = z / r
    d = 0.0
    shells = ((0.35, 0.045, 3.0, 2.0, 0.0),
              (0.65, 0.038, 5.0, 3.0, 1.3),
              (0.95, 0.032, 7.0, 4.0, 2.1))
    for rk, wk, fk, gk, ck in shells:
        m = 0.5 + 0.5 * jnp.cos(fk * az + ck) * jnp.cos(gk * jnp.pi * el)
        d = d + 1.25 * jnp.exp(-_sqr(r - rk) / (2 * wk * wk)) * m
    return jnp.clip(d, 0.0, 1.0)


# equation name -> (fn, box_min, box_max); boxes from volume_implicit.cpp
IMPLICIT_EQUATIONS: dict[str, tuple[Callable, float, float]] = {
    "MARSCHNER_LOBB": (marschner_lobb, -1.0, 1.0),
    "CUBE": (cube, -1.0, 1.0),
    "SPHERE": (sphere, -1.0, 1.0),
    "INVERSE_SPHERE": (inverse_sphere, -1.0, 1.0),
    "DING_DONG": (ding_dong, -2.0, 2.0),
    "ENDRASS": (endrass, -2.0, 2.0),
    "BARTH": (barth, -1.5, 1.5),
    "HEART": (heart, -1.0, 1.0),
    "KLEINE": (kleine, -1.0, 1.0),
    "CASSINI": (cassini, -1.0, 1.0),
    "STEINER": (steiner, -0.5, 0.5),
    "CROSS_CAP": (cross_cap, -1.0, 1.0),
    "KUMMER": (kummer, -2.0, 2.0),
    "BLOBBY": (blobby, -2.0, 2.0),
    "TUBE": (tube, -1.0, 1.0),
    "MULTI_SHELL": (multi_shell, -1.0, 1.0),
}


@struct
class VolumeInterpolationImplicit:
    """Volume-interpolation module evaluating an analytic field directly.

    The world box (``box_min``/``box_size``, the renderer-facing AABB) is
    remapped to the equation's native source box before evaluation
    (reference: renderer/renderer_volume_implicit.cuh:74-99
    ``transformPosition``/``eval``).
    """
    equation: str = static_field(default="SPHERE")
    box_min: Array = None
    box_size: Array = None

    @classmethod
    def make(cls, equation: str = "SPHERE", box_min=(-0.5, -0.5, -0.5),
             box_size=(1.0, 1.0, 1.0)):
        if equation not in IMPLICIT_EQUATIONS:
            raise ValueError(f"unknown implicit equation {equation}")
        return cls(
            equation=equation,
            box_min=np.asarray(box_min, np.float32),
            box_size=np.asarray(box_size, np.float32),
        )

    def eval_density(self, position: Array, direction=None, b: int = 0):
        """position (..., 3) in world space -> (density (...,), is_inside)."""
        fn, tmin, tmax = IMPLICIT_EQUATIONS[self.equation]
        inside = (jnp.all(position >= self.box_min, axis=-1)
                  & jnp.all(position <= self.box_min + self.box_size, axis=-1))
        p01 = (position - self.box_min) / self.box_size
        p = p01 * (tmax - tmin) + tmin
        return fn(p[..., 0], p[..., 1], p[..., 2]), inside

    def eval_normal(self, position: Array, direction=None, b: int = 0,
                    step: float = 1e-3):
        """Central-difference density gradient (the 'normal' in reference
        terms, renderer_volume_implicit.cuh:102-111)."""
        def d(p):
            return self.eval_density(p)[0]
        offs = jnp.eye(3, dtype=position.dtype) * step
        grads = [
            (d(position + offs[i]) - d(position - offs[i])) / (2 * step)
            for i in range(3)
        ]
        return jnp.stack(grads, axis=-1)


def create_implicit_grid(resolution: int, equation: str, dtype=jnp.float32,
                         **params) -> Array:
    """Voxelize an implicit equation: (res, res, res) array indexed [x, y, z].

    Matches ``Volume::createImplicitDataset`` + ``createSyntheticDataset``
    (reference: renderer/volume.cpp:870-891): world coord of voxel i is
    boxMin + i * (boxMax - boxMin) / (res - 1).
    """
    fn, bmin, bmax = IMPLICIT_EQUATIONS[equation]
    coords = bmin + np.arange(resolution) * (bmax - bmin) / (resolution - 1)
    c = jnp.asarray(coords, dtype)
    x = c[:, None, None]
    y = c[None, :, None]
    z = c[None, None, :]
    return fn(x, y, z, **params).astype(dtype)
