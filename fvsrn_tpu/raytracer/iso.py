"""Isosurface ray evaluator (first-hit + binary-search refinement).

Rebuild of ``RayEvaluationSteppingIso``
(reference: renderer/ray_evaluation_stepping.h:28-139 and
renderer/renderer_ray_evaluation_stepping_iso.cuh:48-214): constant-step
march until density > isovalue, then ``binary_search_steps`` bisection steps
between the last outside and first inside sample; shading is
``color * dot(normal, rayDir)`` with optional curvature-driven coloring via a
1D/2D isocontour texture (Kindlmann-style curvature shading).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot, intersect_aabb, safe_normalize
from .dvr import RayEvaluationOutput

SURFACE_FEATURE_OFF = "off"
SURFACE_FEATURE_CURVATURE_TEXTURE = "curvature_texture"
SURFACE_FEATURE_FIRST = "first_principal"
SURFACE_FEATURE_SECOND = "second_principal"
SURFACE_FEATURE_MEAN = "mean"
SURFACE_FEATURE_GAUSSIAN = "gaussian"


@struct
class RayEvaluationSteppingIso:
    stepsize: Array = None
    isovalue: Array = None  # scalar or (B,)
    isocontour_range: Array = None
    isocontour_texture: Array = None  # (R, 4) or (R, R, 4)
    binary_search_steps: int = static_field(default=8)
    surface_feature: str = static_field(default=SURFACE_FEATURE_OFF)

    @classmethod
    def make(cls, stepsize=0.005, isovalue=0.5, binary_search_steps=8,
             surface_feature=SURFACE_FEATURE_OFF, isocontour_range=1.0,
             isocontour_texture=None):
        f32 = lambda v: np.asarray(v, np.float32)
        return cls(stepsize=f32(stepsize), isovalue=f32(isovalue),
                   isocontour_range=f32(isocontour_range),
                   isocontour_texture=isocontour_texture,
                   binary_search_steps=binary_search_steps,
                   surface_feature=surface_feature)


def _shade(config: RayEvaluationSteppingIso, volume, position, ray_dir,
           found: Array, b: int):
    """Evaluate color+normal at a (candidate) surface point
    (reference: renderer_ray_evaluation_stepping_iso.cuh:55-120
    ``evalPoint``'s shading part, applied where found)."""
    n = safe_normalize(volume.eval_normal(position, ray_dir, b=b))
    feature = config.surface_feature
    if feature == SURFACE_FEATURE_OFF:
        color = jnp.ones(position.shape[:-1] + (4,), position.dtype)
    else:
        curv = volume.eval_curvature(position, ray_dir, b=b)  # (..., 2)
        rng = config.isocontour_range
        tex = config.isocontour_texture
        if feature == SURFACE_FEATURE_CURVATURE_TEXTURE:
            tx = (curv[..., 0] + rng) / (2 * rng)
            ty = (-curv[..., 1] + rng) / (2 * rng)
            r = tex.shape[0]
            ix = jnp.clip((tx * r).astype(jnp.int32), 0, r - 1)
            iy = jnp.clip((ty * r).astype(jnp.int32), 0, r - 1)
            color = tex[iy, ix]
        else:
            if feature == SURFACE_FEATURE_FIRST:
                f = curv[..., 0]
            elif feature == SURFACE_FEATURE_SECOND:
                f = curv[..., 1]
            elif feature == SURFACE_FEATURE_MEAN:
                f = 0.5 * (curv[..., 0] + curv[..., 1])
            elif feature == SURFACE_FEATURE_GAUSSIAN:
                f = curv[..., 0] * curv[..., 1]
            else:
                raise ValueError(feature)
            f = (f + rng) / (2 * rng)
            r = tex.shape[0]
            i = jnp.clip((f * r).astype(jnp.int32), 0, r - 1)
            color = tex[i]
    shade = dot(n, ray_dir)
    color = color * shade
    color = color.at[..., 3].set(1.0)
    zero = jnp.zeros_like(color)
    return jnp.where(found, color, zero), jnp.where(found, n, jnp.zeros_like(n))


def refine_and_shade(ray_start: Array, ray_dir: Array, volume: Any,
                     config: RayEvaluationSteppingIso,
                     depth: Array, found: Array,
                     b: int = 0) -> RayEvaluationOutput:
    """Binary refinement between the last outside and first inside
    sample, then curvature/Lambert shading at the hit (reference:
    renderer_ray_evaluation_stepping_iso.cuh:181-208 + evalPoint).
    Shared by the plain march (:func:`trace_iso`) and the fused march
    (:func:`fvsrn_tpu.ops.fused_dvr.fused_trace_iso`) -- per-ray work,
    so plain JAX is the right tool regardless of the march backend."""
    stepsize = config.stepsize.astype(ray_start.dtype)
    iso = config.isovalue
    if iso.ndim > 0:
        iso = iso[b]
    d_out = depth - stepsize
    d_in = depth

    def refine(carry, _):
        depth, d_out, d_in = carry
        d_test = 0.5 * (d_out + d_in)
        position = ray_start + ray_dir * d_test
        value, _ = volume.eval_density(position, ray_dir, b=b)
        inside = found & (value[..., None] > iso)
        depth = jnp.where(inside, d_test, depth)
        d_in = jnp.where(inside, d_test, d_in)
        d_out = jnp.where(inside, d_out, d_test)
        return (depth, d_out, d_in), None

    (depth, _, _), _ = jax.lax.scan(
        refine, (depth, d_out, d_in), None,
        length=config.binary_search_steps)

    position = ray_start + ray_dir * depth
    color, normal = _shade(config, volume, position, ray_dir, found, b)
    return RayEvaluationOutput(color=color, normal=normal, depth=depth)


def trace_iso(ray_start: Array, ray_dir: Array, volume: Any,
              config: RayEvaluationSteppingIso, max_steps: int,
              tmax_in: Optional[Array] = None,
              b: int = 0, lattice: bool = False) -> RayEvaluationOutput:
    dtype = ray_start.dtype
    tmin, tmax_box = intersect_aabb(ray_start, ray_dir,
                                    volume.box_min.astype(dtype),
                                    volume.box_size.astype(dtype))
    tmin = jnp.maximum(tmin, 0.0)
    tmax = tmax_box if tmax_in is None else jnp.minimum(tmax_box, tmax_in)
    stepsize = config.stepsize.astype(dtype)
    iso = config.isovalue
    if iso.ndim > 0:
        iso = iso[b]

    lead = ray_start.shape[:-1]
    depth0 = jnp.zeros(lead + (1,), dtype)
    found0 = jnp.zeros(lead + (1,), bool)
    k0 = jnp.ceil(tmin / stepsize) if lattice else None

    def step(carry, i):
        depth, found = carry
        if lattice:
            tcurrent = (k0 + i.astype(dtype)) * stepsize
        else:
            tcurrent = tmin + i.astype(dtype) * stepsize
        valid = (tcurrent <= tmax) & ~found
        position = ray_start + ray_dir * tcurrent
        value, _ = volume.eval_density(position, ray_dir, b=b)
        inside = valid & (value[..., None] > iso)
        depth = jnp.where(inside, tcurrent, depth)
        found = found | inside
        return (depth, found), None

    (depth, found), _ = jax.lax.scan(
        step, (depth0, found0), jnp.arange(max_steps, dtype=jnp.int32))

    return refine_and_shade(ray_start, ray_dir, volume, config, depth,
                            found, b=b)
