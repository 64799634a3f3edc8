"""Direct-volume-rendering ray evaluator (constant stepping), plain JAX.

Rebuild of ``RayEvaluationSteppingDvr``
(reference: renderer/ray_evaluation_stepping.h:141-179 and the device loop in
renderer/renderer_ray_evaluation_stepping_dvr.cuh:36-158), and semantically
equal to the PyTorch emulation ``Raytracing._full_trace_forward``
(reference: applications/volnet/raytracing.py:275-329) used as the gradient
oracle.

TPU design notes:
- The march is a ``lax.scan`` over a *static* step count with per-lane
  validity masks; the reference does exactly this under
  ``KERNEL_SYNCHRONIZED_TRACING`` (warp-uniform loop exits, wasted lanes
  instead of divergence), so masked execution preserves its semantics.
- Everything is channel-last and flat over rays so the same function serves
  (H*W) images, training ray batches, and shard_map blocks.
- Reverse-mode AD through the scan gives reference gradients with O(steps)
  memory; the O(1)-memory inverted-blending backward lives in
  :mod:`fvsrn_tpu.raytracer.diff` and the fused Pallas path in
  :mod:`fvsrn_tpu.ops`.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .. import blending
from ..utils.pytree import static_field, struct
from ..utils.vecmath import intersect_aabb, safe_normalize


class RayEvaluationOutput(NamedTuple):
    """Per-ray result (reference: kernel::RayEvaluationOutput,
    renderer/renderer_utils.cuh): color rgba, alpha-blended normal, depth."""
    color: Array   # (..., 4)
    normal: Array  # (..., 3)
    depth: Array   # (..., 1)


@struct
class RayEvaluationSteppingDvr:
    """Configuration pytree for the stepping DVR evaluator.

    ``stepsize`` is in world units ("world" stepsize mode); the reference's
    object-space mode divides by the voxel resolution on the host
    (reference: ray_evaluation_stepping.h:11-26).
    """
    stepsize: Array = None
    alpha_early_out: Array = None
    density_min: Array = None
    density_max: Array = None
    blend_mode: str = static_field(default=blending.BLEND_BEER_LAMBERT)
    enable_early_out: bool = static_field(default=True)
    need_normals: bool = static_field(default=False)

    @classmethod
    def make(cls, stepsize=0.005, alpha_early_out=0.999,
             density_min=0.0, density_max=1.0,
             blend_mode=blending.BLEND_BEER_LAMBERT,
             enable_early_out=True, need_normals=False):
        f32 = lambda v: np.asarray(v, np.float32)
        return cls(stepsize=f32(stepsize), alpha_early_out=f32(alpha_early_out),
                   density_min=f32(density_min), density_max=f32(density_max),
                   blend_mode=blend_mode, enable_early_out=enable_early_out,
                   need_normals=need_normals)


def max_steps_bound(box_size, stepsize: float) -> int:
    """Static upper bound on the number of marching steps: the box diagonal
    over the stepsize (the reference computes the data-dependent
    ``int(max(tmax-tmin)/stepsize)`` on the host, raytracing.py:301)."""
    try:
        diag = float(np.linalg.norm(np.asarray(box_size, np.float64)))
        return int(math.ceil(diag / float(stepsize))) + 1
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError) as e:
        raise ValueError(
            "max_steps must be static: compute it outside jit (e.g. "
            "max_steps_bound(volume.box_size, stepsize)) and pass it "
            "explicitly, e.g. render(..., max_steps=N) or "
            "jax.jit(render_image, static_argnames='max_steps')") from e


def trace_dvr(ray_start: Array, ray_dir: Array, volume: Any, tf: Any,
              config: RayEvaluationSteppingDvr,
              max_steps: int,
              brdf: Any = None,
              tmax_in: Optional[Array] = None,
              tmin_in: Optional[Array] = None,
              b: int = 0,
              checkpoint_chunk: Optional[int] = None,
              lattice: bool = False,
              step_offset: int = 0) -> RayEvaluationOutput:
    """March rays through ``volume`` with constant step size.

    Args:
      ray_start, ray_dir: (..., 3) world-space rays.
      volume: module with ``eval_density``/``eval_normal`` and
        ``box_min``/``box_size`` attributes.
      tf: transfer function module (``eval_normalized``).
      max_steps: static step count (see :func:`max_steps_bound`).
      tmax_in: optional (..., 1) maximum t (from a rasterized depth
        pre-pass, reference: renderer_image_evaluator_simple.cuh:61-71).
      tmin_in: optional (..., 1) minimum t (entry empty-space clip,
        e.g. from ops.fused_dvr.probe_entry_tmin); the march starts at
        max(tmin, tmin_in) with a fresh previous-density carry.
      lattice: sample on the global step lattice t = k*stepsize
        (first sample at ceil(tmin/stepsize)*stepsize) instead of the
        reference's per-ray start t = tmin + i*stepsize. A sub-step
        phase shift per ray; used by the fused boxfeat latent path,
        whose per-tile spatial coherence requires lattice-aligned
        sampling (see fvsrn_tpu.ops.fused_dvr).
      step_offset: first step index (marches i in [step_offset,
        step_offset + max_steps)) -- the ray-SEGMENT partition axis for
        context-parallel marching (parallel.train_step.make_cp_render):
        per-span partial composites are exact because the over operator
        is associative. Use enable_early_out=False across spans.

    Returns ``RayEvaluationOutput`` with rgba color, alpha-weighted normal
    and depth, exactly matching the reference device loop
    (renderer_ray_evaluation_stepping_dvr.cuh:49-158).
    """
    dtype = ray_start.dtype
    tmin, tmax_box = intersect_aabb(ray_start, ray_dir,
                                    volume.box_min.astype(dtype),
                                    volume.box_size.astype(dtype))
    tmin = jnp.maximum(tmin, 0.0)
    if tmin_in is not None:
        tmin = jnp.maximum(tmin, tmin_in)
    tmax = tmax_box if tmax_in is None else jnp.minimum(tmax_box, tmax_in)

    stepsize = config.stepsize.astype(dtype)
    inv_range = 1.0 / (config.density_max - config.density_min)

    lead = ray_start.shape[:-1]
    rgb0 = jnp.zeros(lead + (3,), dtype)
    alpha0 = jnp.zeros(lead + (1,), dtype)
    normal0 = jnp.zeros(lead + (3,), dtype)
    depth0 = jnp.zeros(lead + (1,), dtype)
    prev0 = jnp.full(lead + (1,), -1.0, dtype)

    skip_tf = getattr(volume, "outputs_color", False)

    k0 = jnp.ceil(tmin / stepsize) if lattice else None

    def step(carry, i):
        rgb, alpha, normal_acc, depth_acc, prev = carry
        if lattice:
            tcurrent = (k0 + i.astype(dtype)) * stepsize
        else:
            tcurrent = tmin + i.astype(dtype) * stepsize
        valid = tcurrent <= tmax
        if config.enable_early_out:
            valid = valid & (alpha < config.alpha_early_out)
        position = ray_start + ray_dir * tcurrent

        if skip_tf:
            # color field: the volume outputs rgbo directly; scale the
            # absorption by the stepsize manually (reference:
            # renderer_ray_evaluation_stepping_dvr.cuh:105-111
            # SKIP_TRANSFER_FUNCTION branch)
            value4, _inside = volume.eval_density(position, ray_dir, b=b)
            color1 = value4.at[..., 3].multiply(stepsize)
            color1 = jnp.where(valid, color1, jnp.zeros_like(color1))
            n = jnp.zeros_like(position)
            new_prev = prev
        else:
            value, _inside = volume.eval_density(position, ray_dir, b=b)
            value = value[..., None]
            density2 = (value - config.density_min) * inv_range
            require = valid & (value >= config.density_min)

            if config.need_normals:
                n = volume.eval_normal(position, ray_dir, b=b)
            else:
                n = jnp.zeros_like(position)

            color1 = tf.eval_normalized(
                jnp.clip(density2[..., 0], 0.0, 1.0), n,
                prev[..., 0], stepsize, b=b)
            color1 = jnp.where(require, color1, jnp.zeros_like(color1))
            new_prev = density2

        if brdf is not None:
            color2 = brdf.eval(color1, position, n, ray_dir, b=b)
        else:
            color2 = color1
        n_safe = safe_normalize(n)

        contribute = valid & (color1[..., 3:4] > 0)
        # masked blend: where not contributing, pass accumulator through
        new_rgb, new_alpha, new_normal, new_depth = blending.blend_step(
            rgb, alpha, color2, config.blend_mode,
            acc_normal=normal_acc, contrib_normal=n_safe,
            acc_depth=depth_acc, contrib_depth=tcurrent)
        rgb = jnp.where(contribute, new_rgb, rgb)
        alpha = jnp.where(contribute, new_alpha, alpha)
        normal_acc = jnp.where(contribute, new_normal, normal_acc)
        depth_acc = jnp.where(contribute, new_depth, depth_acc)
        return (rgb, alpha, normal_acc, depth_acc, new_prev), None

    carry0 = (rgb0, alpha0, normal0, depth0, prev0)
    steps_iota = step_offset + jnp.arange(max_steps, dtype=jnp.int32)
    if checkpoint_chunk is None:
        (rgb, alpha, normal_acc, depth_acc, _), _ = jax.lax.scan(
            step, carry0, steps_iota)
    elif checkpoint_chunk == 1:
        # per-step rematerialization: the scan stores only the small carry
        # (9 floats/ray/step) and recomputes the network evaluation in the
        # backward -- same memory shape as the reference's inverted-blending
        # backward, paid in recompute instead of algebraic inversion.
        (rgb, alpha, normal_acc, depth_acc, _), _ = jax.lax.scan(
            jax.checkpoint(step), carry0, steps_iota)
    else:
        # sqrt-decomposition rematerialization: outer scan over chunks with
        # jax.checkpoint'ed inner scans -> O(S/chunk) stored carries +
        # O(chunk) recompute, the TPU analogue of the reference's
        # checkpointed trace (applications/volnet/raytracing.py:526-619,
        # which instead inverts the blending for O(1) memory).
        chunk = int(checkpoint_chunk)
        n_chunks = (max_steps + chunk - 1) // chunk

        @jax.checkpoint
        def chunk_fn(carry, c):
            return jax.lax.scan(
                step, carry,
                step_offset + c * chunk
                + jnp.arange(chunk, dtype=jnp.int32))

        (rgb, alpha, normal_acc, depth_acc, _), _ = jax.lax.scan(
            chunk_fn, carry0, jnp.arange(n_chunks, dtype=jnp.int32))

    color = jnp.concatenate([rgb, alpha], axis=-1)
    return RayEvaluationOutput(color=color, normal=normal_acc,
                               depth=depth_acc)
