"""Monte-Carlo volumetric path tracing: delta tracking, NEE, multi-bounce.

Rebuild of ``RayEvaluationMonteCarlo``
(reference: renderer/ray_evaluation_monte_carlo.h:12-77 and the device code
renderer/renderer_ray_evaluation_monte_carlo.cuh:59-317), matching the
PyTorch emulation used for training GT
(reference: applications/volnet/raytracing.py:331-478).

TPU design:
- the unbounded delta-tracking ``while`` becomes a ``lax.while_loop`` over
  all rays with an "any ray still walking" condition -- exactly the
  reference's warp-synchronized loop exit semantics at batch granularity --
  plus a hard ``max_iterations`` safety bound;
- cuRAND per-thread XORWOW (renderer_sampler_curand.cuh) becomes
  counter-based ``jax.random`` keys folded per ray and per loop iteration,
  so results are reproducible under any sharding.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot, intersect_aabb, normalize, safe_normalize
from .dvr import RayEvaluationOutput


@struct
class RayEvaluationMonteCarlo:
    """Config (reference: ray_evaluation_monte_carlo.h:12-77): spherical
    area light, scattering bounces, TF-driven absorption with
    ``max_absorption`` as the delta-tracking majorant."""
    max_absorption: Array = None        # majorant (from tf.max_absorption())
    density_min: Array = None
    density_max: Array = None
    light_position: Array = None        # (3,)
    light_radius: Array = None
    light_intensity: Array = None
    color_scaling: Array = None
    sh_coefficients: Optional[Array] = None  # ((deg+1)^2, 3) environment
    num_bounces: int = static_field(default=2)
    max_iterations: int = static_field(default=512)

    @classmethod
    def make(cls, max_absorption=10.0, density_min=0.0, density_max=1.0,
             light_position=(0.0, 2.0, 0.0), light_radius=0.5,
             light_intensity=1.0, color_scaling=1.0, num_bounces=2,
             max_iterations=512, sh_coefficients=None):
        f32 = lambda v: np.asarray(v, np.float32)
        if sh_coefficients is not None:
            sh_coefficients = f32(sh_coefficients)
            n = sh_coefficients.shape[0]
            if int(np.sqrt(n)) ** 2 != n or sh_coefficients.shape[1:] != (3,):
                raise ValueError(
                    "sh_coefficients must be ((degree+1)^2, 3) rgb "
                    f"coefficients, got {sh_coefficients.shape}")
        return cls(max_absorption=f32(max_absorption),
                   density_min=f32(density_min), density_max=f32(density_max),
                   light_position=f32(light_position),
                   light_radius=f32(light_radius),
                   light_intensity=f32(light_intensity),
                   color_scaling=f32(color_scaling),
                   sh_coefficients=sh_coefficients,
                   num_bounces=num_bounces, max_iterations=max_iterations)


class _DeltaResult(NamedTuple):
    t_out: Array        # (..., 1) >0 iff a medium interaction was sampled
    hit_position: Array  # (..., 3)
    hit_color: Array     # (..., 4) TF color at the interaction
    hit_normal: Array    # (..., 3)


def _ray_keys(key: Array, ray_id: Array):
    flat = ray_id.reshape(-1)
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, flat)


def ray_uniform(key: Array, ray_id: Array, dtype, minval=0.0) -> Array:
    """Counter-based per-ray uniform draw (the role of the reference's
    per-thread cuRAND XORWOW, renderer_sampler_curand.cuh:21-40): the
    value for a ray depends only on (key, ray_id), so results are
    IDENTICAL under any sharding/batching of the ray set -- the
    multi-host determinism contract of the MC evaluator
    (tests/test_mc.py, tests/test_parallel.py). Returns ray_id.shape+(1,)."""
    ks = _ray_keys(key, ray_id)
    u = jax.vmap(lambda k: jax.random.uniform(k, (), dtype,
                                              minval=minval))(ks)
    return u.reshape(ray_id.shape + (1,))


def ray_normal3(key: Array, ray_id: Array, dtype) -> Array:
    """Per-ray 3D standard normal (see :func:`ray_uniform`)."""
    ks = _ray_keys(key, ray_id)
    g = jax.vmap(lambda k: jax.random.normal(k, (3,), dtype))(ks)
    return g.reshape(ray_id.shape + (3,))


def _default_ray_id(lead) -> Array:
    n = int(np.prod(lead)) if lead else 1
    return jnp.arange(n, dtype=jnp.uint32).reshape(lead)


def delta_tracking(key: Array, ray_start: Array, ray_dir: Array,
                   volume: Any, tf: Any, config: RayEvaluationMonteCarlo,
                   need_normals: bool = True, b: int = 0,
                   ray_id: Optional[Array] = None) -> _DeltaResult:
    """Woodcock/delta tracking (reference: renderer_ray_evaluation_
    monte_carlo.cuh:75-153 ``deltaTracking``): free-flight sampling against
    the majorant ``max_absorption``; a tentative collision is real with
    probability sigma(x)/majorant. Walk starts at ``ray_start`` (t=0) and
    terminates on leaving the volume (t_out=0) or on a real collision
    (t_out=t)."""
    dtype = ray_start.dtype
    lead = ray_start.shape[:-1]
    if ray_id is None:
        ray_id = _default_ray_id(lead)
    inv_major = 1.0 / config.max_absorption
    inv_range = 1.0 / (config.density_max - config.density_min)

    def cond(state):
        it, _key, valid, *_ = state
        return (it < config.max_iterations) & jnp.any(valid)

    def body(state):
        it, key, valid, tcur, t_out, hit_pos, hit_col, hit_nrm = state
        key, k1, k2 = jax.random.split(key, 3)
        u1 = ray_uniform(k1, ray_id, dtype, minval=1e-10)
        tcur = tcur - jnp.log(u1) * inv_major
        position = ray_start + ray_dir * tcur

        value, inside = volume.eval_density(position, ray_dir, b=b)
        value = value[..., None]
        inside = inside[..., None]

        # exited the volume -> terminate with no interaction
        exit_now = valid & ~inside
        hit_pos = jnp.where(exit_now, position, hit_pos)
        t_out = jnp.where(exit_now, 0.0, t_out)
        valid = valid & inside

        require = valid & (value >= config.density_min)
        if need_normals:
            normal = volume.eval_normal(position, ray_dir, b=b)
        else:
            normal = jnp.zeros_like(position)
        density2 = (value - config.density_min) * inv_range
        color = tf.eval_normalized(jnp.clip(density2[..., 0], 0.0, 1.0),
                                   normal, None, 1.0, b=b)
        u2 = ray_uniform(k2, ray_id, dtype)
        real_hit = require & (color[..., 3:4] * inv_major > u2)
        hit_pos = jnp.where(real_hit, position, hit_pos)
        hit_col = jnp.where(real_hit, color, hit_col)
        hit_nrm = jnp.where(real_hit, normal, hit_nrm)
        t_out = jnp.where(real_hit, tcur, t_out)
        valid = valid & ~real_hit
        return (it + 1, key, valid, tcur, t_out, hit_pos, hit_col, hit_nrm)

    zero3 = jnp.zeros(lead + (3,), dtype)
    state = (jnp.int32(0), key,
             jnp.ones(lead + (1,), bool),
             jnp.zeros(lead + (1,), dtype),       # tcurrent
             jnp.zeros(lead + (1,), dtype),       # t_out
             zero3, jnp.zeros(lead + (4,), dtype), zero3)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, t_out, hit_pos, hit_col, hit_nrm = state
    return _DeltaResult(t_out, hit_pos, hit_col, hit_nrm)


def sample_light_position(key: Array, config: RayEvaluationMonteCarlo,
                          shape: tuple, dtype,
                          ray_id: Optional[Array] = None) -> Array:
    """Uniform point on the light sphere's surface
    (reference: cuh:157-176 ``sampleLightPosition``; the rejection loop is
    replaced by the exact gaussian-normalization sphere sampler).
    ``ray_id``: per-ray counter keys (sharding-invariant draws)."""
    if ray_id is not None:
        g = ray_normal3(key, ray_id, dtype)
    else:
        g = jax.random.normal(key, shape + (3,), dtype)
    return normalize(g) * config.light_radius + config.light_position


def eval_background(ray_start: Array, ray_dir: Array,
                    config: RayEvaluationMonteCarlo):
    """Background radiance for escaped rays: ray/light-sphere
    intersection (reference: cuh:182-203 ``evalBackground``) plus an
    optional spherical-harmonics environment term evaluated in the
    escape direction (``config.sh_coefficients``, ((deg+1)^2, 3) rgb --
    the MC hookup of the reference's SH utility,
    renderer/spherical_harmonics.h:19-42 /
    renderer_spherical_harmonics.cuh)."""
    center = jnp.asarray(config.light_position)
    radius = jnp.asarray(config.light_radius)
    oc = ray_start - center
    a = jnp.sum(ray_dir * ray_dir, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(ray_dir * oc, axis=-1, keepdims=True)
    c = jnp.sum(oc * oc, axis=-1, keepdims=True) - radius * radius
    disc = b * b - 4 * a * c
    is_light = disc > 0
    rgb = jnp.where(is_light, config.light_intensity, 0.0)
    rgb = jnp.broadcast_to(rgb, ray_dir.shape[:-1] + (3,))
    alpha = is_light.astype(ray_start.dtype)
    if config.sh_coefficients is not None:
        from .. import sh
        n = config.sh_coefficients.shape[0]
        degree = int(math.isqrt(n)) - 1
        basis = sh.evaluate(safe_normalize(ray_dir), degree)
        env = jnp.maximum(basis @ config.sh_coefficients, 0.0)
        rgb = rgb + jnp.where(is_light, 0.0, env)
        alpha = jnp.maximum(
            alpha, (jnp.sum(env, axis=-1, keepdims=True) > 0)
            .astype(ray_start.dtype))
    return jnp.concatenate([rgb, alpha], axis=-1)


def trace_mc(key: Array, ray_start: Array, ray_dir: Array, volume: Any,
             tf: Any, phase: Any, config: RayEvaluationMonteCarlo,
             b: int = 0,
             ray_id: Optional[Array] = None) -> RayEvaluationOutput:
    """Full path-traced evaluation with next-event estimation to the
    spherical light (reference: cuh:205-313 ``eval``).

    ``ray_id`` (lead-shaped uint32, default arange): the per-ray PRNG
    counter -- all draws depend only on (key, ray_id), so a sharded
    trace with global ray ids reproduces the single-device trace to
    1-ULP elementwise rounding (multi-host determinism for the allclose
    gates, SURVEY §7; tests/test_parallel.py)."""
    dtype = ray_start.dtype
    lead = ray_start.shape[:-1]
    if ray_id is None:
        ray_id = _default_ray_id(lead)
    tmin, tmax = intersect_aabb(ray_start, ray_dir,
                                jnp.asarray(volume.box_min, dtype),
                                jnp.asarray(volume.box_size, dtype))
    tmin = jnp.maximum(tmin, 0.0)

    emission = jnp.zeros(lead + (3,), dtype)
    beta = jnp.ones(lead + (3,), dtype)
    out_alpha = jnp.zeros(lead + (1,), dtype)
    out_depth = jnp.zeros(lead + (1,), dtype)
    out_normal = jnp.zeros(lead + (3,), dtype)
    position = ray_start + tmin * ray_dir
    direction = ray_dir
    valid = jnp.ones(lead + (1,), bool)

    for bounce in range(config.num_bounces + 1):
        key, k_walk, k_light, k_shadow, k_dir = jax.random.split(key, 5)
        hit = delta_tracking(k_walk, position, direction, volume, tf,
                             config, b=b, ray_id=ray_id)
        any_hit = hit.t_out > 0
        if bounce == 0:
            out_alpha = jnp.where(valid, any_hit.astype(dtype), out_alpha)
            out_depth = jnp.where(valid, hit.t_out, out_depth)
            out_normal = jnp.where(valid, hit.hit_normal, out_normal)

        # medium interaction: modulate throughput
        beta = jnp.where(
            any_hit,
            beta * hit.hit_color[..., :3]
            * (hit.hit_color[..., 3:4] * config.color_scaling),
            beta)

        # 1. direct illumination (NEE): shadow ray to the light sphere
        light_pos = sample_light_position(k_light, config, lead, dtype,
                                          ray_id=ray_id)
        light_dir = normalize(light_pos - hit.hit_position)
        p = phase.prob(direction, light_dir, hit.hit_position, b=b)[..., None]
        shadow = delta_tracking(k_shadow, hit.hit_position, light_dir,
                                volume, tf, config, need_normals=False,
                                b=b, ray_id=ray_id)
        unoccluded = shadow.t_out <= 0
        contrib = beta * (p * config.light_intensity)
        emission = jnp.where(any_hit & valid & unoccluded,
                             emission + contrib, emission)

        # 2. scatter into the next direction (per-ray uniforms)
        ku, kphi = jax.random.split(jax.random.fold_in(k_dir, 7))
        u_s = ray_uniform(ku, ray_id, dtype)[..., 0]
        uphi_s = ray_uniform(kphi, ray_id, dtype)[..., 0]
        next_dir = phase.sample(k_dir, direction, hit.hit_position, b=b,
                                u=u_s, u_phi=uphi_s)
        pn = phase.prob(direction, next_dir, hit.hit_position, b=b)[..., None]
        go_on = any_hit & valid
        beta = jnp.where(go_on, beta * pn, beta)
        position = jnp.where(go_on, hit.hit_position, position)
        direction = jnp.where(go_on, next_dir, direction)
        valid = valid & any_hit

    return RayEvaluationOutput(
        color=jnp.concatenate([emission, out_alpha], axis=-1),
        normal=safe_normalize(out_normal),
        depth=out_depth)
