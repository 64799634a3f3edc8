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


_TF_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32, 20 rounds (Salmon et al. 2011 -- the same family
    JAX's PRNG uses), hand-vectorized over u32 counter vectors.

    Why not ``vmap(fold_in)`` + ``vmap(uniform)``: that spelling chains
    TWO full threefry blocks per draw through jax's typed-key machinery
    and compiles to something orders of magnitude slower inside a
    ``while_loop`` (measured: 256 tracking iterations of key draws at
    16k rays did not finish in 400 s; this form is microseconds per
    draw). One block of 20 rounds of add/rotate/xor on (N,) u32 lanes
    is ~100 VPU ops per draw."""
    ks0 = k0
    ks1 = k1
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (ks0, ks1, ks2)
    x0 = x0 + ks0
    x1 = x1 + ks1

    def rot(v, r):
        return (v << jnp.uint32(r)) | (v >> jnp.uint32(32 - r))

    for block in range(5):
        for i in range(4):
            x0 = x0 + x1
            x1 = rot(x1, _TF_ROT[(block % 2) * 4 + i])
            x1 = x1 ^ x0
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + jnp.uint32(block + 1)
    return x0, x1


def _ray_bits2(key: Array, ray_id: Array, salt: int = 0):
    """Two u32 streams per ray, a pure function of (key, ray_id, salt):
    the sharding-invariance contract (a sharded trace with GLOBAL ray
    ids reproduces the single-device draws bitwise, whatever the local
    batch shapes are)."""
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    rid = ray_id.reshape(-1).astype(jnp.uint32)
    return _threefry2x32(kd[0], kd[1] + jnp.uint32(salt), rid,
                         jnp.zeros_like(rid))


def _bits_to_unit(bits, dtype):
    # 24 high bits -> [0, 1) (f32 mantissa-exact)
    return (bits >> jnp.uint32(8)).astype(dtype) * dtype(1.0 / (1 << 24))


def ray_uniform(key: Array, ray_id: Array, dtype, minval=0.0,
                salt=0) -> Array:
    """Counter-based per-ray uniform draw in [minval, 1) (the role of the
    reference's per-thread cuRAND XORWOW, renderer_sampler_curand.cuh:
    21-40): the value for a ray depends only on (key, ray_id, salt), so
    results are IDENTICAL under any sharding/batching of the ray set --
    the multi-host determinism contract of the MC evaluator
    (tests/test_mc.py, tests/test_parallel.py) -- AND independent of how
    many tracking steps are batched per round (``salt`` = the step/draw
    counter). Returns ray_id.shape+(1,)."""
    b0, _ = _ray_bits2(key, ray_id, salt=salt)
    u = _bits_to_unit(b0, jnp.dtype(dtype).type)
    if minval:
        u = u * (1.0 - minval) + minval
    return u.astype(dtype).reshape(ray_id.shape + (1,))


def ray_normal3(key: Array, ray_id: Array, dtype) -> Array:
    """Per-ray 3D standard normal via Box-Muller on two counter draws
    (see :func:`ray_uniform`)."""
    b0, b1 = _ray_bits2(key, ray_id)
    c0, c1 = _ray_bits2(key, ray_id, salt=1)
    tiny = 1e-12
    u1 = jnp.maximum(_bits_to_unit(b0, np.float32), tiny)
    u2 = _bits_to_unit(b1, np.float32)
    u3 = jnp.maximum(_bits_to_unit(c0, np.float32), tiny)
    u4 = _bits_to_unit(c1, np.float32)
    r1 = jnp.sqrt(-2.0 * jnp.log(u1))
    r2 = jnp.sqrt(-2.0 * jnp.log(u3))
    a1 = 2.0 * np.pi * u2
    a2 = 2.0 * np.pi * u4
    g = jnp.stack([r1 * jnp.cos(a1), r1 * jnp.sin(a1),
                   r2 * jnp.cos(a2)], axis=-1)
    return g.astype(dtype).reshape(ray_id.shape + (3,))


def _default_ray_id(lead) -> Array:
    n = int(np.prod(lead)) if lead else 1
    return jnp.arange(n, dtype=jnp.uint32).reshape(lead)


def delta_tracking(key: Array, ray_start: Array, ray_dir: Array,
                   volume: Any, tf: Any, config: RayEvaluationMonteCarlo,
                   need_normals: bool = True, b: int = 0,
                   ray_id: Optional[Array] = None,
                   sampler: Any = None,
                   steps_per_round: int = 1,
                   active: Optional[Array] = None,
                   compact_stages: tuple = ()) -> _DeltaResult:
    """Woodcock/delta tracking (reference: renderer_ray_evaluation_
    monte_carlo.cuh:75-153 ``deltaTracking``): free-flight sampling against
    the majorant ``max_absorption``; a tentative collision is real with
    probability sigma(x)/majorant. Walk starts at ``ray_start`` (t=0) and
    terminates on leaving the volume (t_out=0) or on a real collision
    (t_out=t).

    ``sampler``: optional ``(position, direction) -> (density, inside)``
    replacing ``volume.eval_density`` -- the hook for the FUSED SRN
    sample evaluator (:func:`fvsrn_tpu.ops.fused_eval.make_fused_eval`),
    the TPU counterpart of the reference's in-tracking-loop tensor-core
    MLP (renderer_ray_evaluation_monte_carlo.cuh:59-317 +
    renderer_volume_tensorcores.cuh:736).

    ``steps_per_round``: tracking steps evaluated per loop round as ONE
    sample batch. Legal because free-flight distances are pure PRNG
    (independent of the densities): t_j = cumsum of exponentials, so K
    tentative positions are known upfront and only the FIRST
    exit/acceptance event per ray is kept. Every draw is a pure function
    of (key, ray_id, step index), so the walk is IDENTICAL for any K
    (tested). Measured on v5e at 16k rays: K=1 is fastest (the while
    round is eval-bound, not dispatch-bound, and K>1 pays for evals
    past each ray's event); the knob exists for parts with higher
    per-round overhead.

    Normals are computed LAZILY: unless the TF consumes gradients per
    sample (gradient-scaled gaussian, ``scale_with_gradient``), the
    normal is evaluated ONCE at the recorded interaction point after
    the walk instead of at every tentative collision -- identical
    result (the normal is a deterministic function of position), and it
    removes the per-iteration ``eval_normal`` (for adjoint-mode SRNs, a
    full extra forward+backward per tracking step).

    ``active`` (lead + (1,) bool): rays that participate at all --
    trace_mc's later bounces walk only surviving rays; inactive rays
    return t_out=0 untouched.

    ``compact_stages``: round-4 LIVE-RAY COMPACTION, the batch analog
    of the reference's per-warp divergence cost (each walk is
    alive-tail-bound: every round evaluates ALL N lanes until the LAST
    ray terminates, while the live count decays geometrically). A
    static pyramid ((rounds_0, width_0), (rounds_1, width_1), ...):
    after ``rounds_i`` more rounds at the current width, the first
    ``width_i`` live rays (stable index order) are gathered into a
    narrower buffer and continue there; any OVERFLOW live rays beyond
    ``width_i`` (rare -- widths are sized from liveness statistics)
    finish in the current-width loop, so compaction is a performance
    schedule, never a correctness cap. Because every draw is a pure
    counter function of (key, ray_id, global step), the compacted walk
    is BITWISE identical to the uncompacted one -- no host syncs, the
    whole pyramid stays inside one jit."""
    dtype = ray_start.dtype
    lead = ray_start.shape[:-1]
    if ray_id is None:
        ray_id = _default_ray_id(lead)
    K = max(1, int(steps_per_round))
    inv_major = 1.0 / config.max_absorption
    inv_range = 1.0 / (config.density_max - config.density_min)
    tf_needs_normal = bool(getattr(tf, "scale_with_gradient", False))
    inloop_normals = need_normals and tf_needs_normal

    def eval_density(position, rd_):
        # position: (K,) + batch + (3,); direction broadcasts over K
        if sampler is not None:
            value, inside = sampler(position, rd_)
        else:
            value, inside = volume.eval_density(position, rd_, b=b)
        return value[..., None], inside[..., None]

    def make_cond(rounds):
        def cond(state):
            it, it0, valid, *_ = state
            ok = (it < config.max_iterations) & jnp.any(valid)
            if rounds is not None:
                ok = ok & (it < it0 + rounds)
            return ok
        return cond

    def body(state, rs_, rd_, rid_):
        it, it0, valid, tcur, t_out, hit_pos, hit_col, hit_nrm = state
        # K free-flight steps drawn at once; draw index = global step
        u1 = jnp.stack([
            ray_uniform(key, rid_, dtype, minval=1e-10,
                        salt=2 * (it + j)) for j in range(K)], axis=0)
        u2 = jnp.stack([
            ray_uniform(key, rid_, dtype, salt=2 * (it + j) + 1)
            for j in range(K)], axis=0)
        t_j = tcur[None] - jnp.cumsum(jnp.log(u1), axis=0) * inv_major
        position = rs_[None] + rd_[None] * t_j   # (K,)+batch+(3,)
        value, inside = eval_density(position, rd_)
        if inloop_normals:
            normal = volume.eval_normal(position, rd_, b=b)
        else:
            normal = jnp.zeros_like(position)
        density2 = (value - config.density_min) * inv_range
        color = tf.eval_normalized(jnp.clip(density2[..., 0], 0.0, 1.0),
                                   normal, None, 1.0, b=b)

        walking = valid
        for j in range(K):
            # exit check precedes acceptance at the same step
            exit_now = walking & ~inside[j]
            hit_pos = jnp.where(exit_now, position[j], hit_pos)
            t_out = jnp.where(exit_now, 0.0, t_out)
            walking = walking & inside[j]
            require = walking & (value[j] >= config.density_min)
            real_hit = require & (color[j][..., 3:4] * inv_major > u2[j])
            hit_pos = jnp.where(real_hit, position[j], hit_pos)
            hit_col = jnp.where(real_hit, color[j], hit_col)
            hit_nrm = jnp.where(real_hit, normal[j], hit_nrm)
            t_out = jnp.where(real_hit, t_j[j], t_out)
            walking = walking & ~real_hit
        tcur = jnp.where(walking, t_j[K - 1], tcur)
        return (it + K, it0, walking, tcur, t_out, hit_pos, hit_col,
                hit_nrm)

    def run_rounds(state, rounds, rs_, rd_, rid_):
        """Advance the walk by up to ``rounds`` rounds (None = to
        completion / the global iteration cap)."""
        it = state[0]
        state = (it, it) + state[2:]
        return jax.lax.while_loop(
            make_cond(rounds), lambda s: body(s, rs_, rd_, rid_), state)

    valid0 = (jnp.ones(lead + (1,), bool) if active is None
              else jnp.broadcast_to(active, lead + (1,)))
    zero3 = jnp.zeros(lead + (3,), dtype)
    state = (jnp.int32(0), jnp.int32(0), valid0,
             jnp.zeros(lead + (1,), dtype),       # tcurrent
             jnp.zeros(lead + (1,), dtype),       # t_out
             zero3, jnp.zeros(lead + (4,), dtype), zero3)

    if not compact_stages:
        state = run_rounds(state, None, ray_start, ray_dir, ray_id)
        _, _, _, _, t_out, hit_pos, hit_col, hit_nrm = state
    else:
        n = int(np.prod(lead)) if lead else 1

        def flat(a, c):
            return a.reshape(n, c)

        rs_c = flat(ray_start, 3)
        rd_c = flat(ray_dir, 3)
        rid_c = ray_id.reshape(n)
        st = (state[0], state[1], flat(state[2], 1), flat(state[3], 1),
              flat(state[4], 1), flat(state[5], 3), flat(state[6], 4),
              flat(state[7], 3))
        out_rows = [jnp.zeros((n, 1), dtype), jnp.zeros((n, 3), dtype),
                    jnp.zeros((n, 4), dtype), jnp.zeros((n, 3), dtype)]
        cur_idx = jnp.arange(n, dtype=jnp.int32)
        for rounds, width in compact_stages:
            if width >= cur_idx.shape[0]:
                continue
            st = run_rounds(st, rounds, rs_c, rd_c, rid_c)
            live = st[2][:, 0]
            order = jnp.argsort(~live, stable=True)   # live rays first
            inv = jnp.argsort(order)
            taken = live & (inv < width)
            # overflow (live beyond `width`) + finished rays finalize at
            # the current width; with no overflow the loop exits on its
            # first cond evaluation
            st_of = (st[0], st[1], (live & ~taken)[:, None]) + st[3:]
            st_of = run_rounds(st_of, None, rs_c, rd_c, rid_c)
            for i, v_ in enumerate(st_of[4:8]):
                out_rows[i] = out_rows[i].at[cur_idx].set(v_)
            idx_k = order[:width]
            cur_idx = cur_idx[idx_k]
            rs_c = rs_c[idx_k]
            rd_c = rd_c[idx_k]
            rid_c = rid_c[idx_k]
            st = (st[0], st[1], taken[idx_k][:, None], st[3][idx_k],
                  st[4][idx_k], st[5][idx_k], st[6][idx_k], st[7][idx_k])
        st = run_rounds(st, None, rs_c, rd_c, rid_c)
        for i, v_ in enumerate(st[4:8]):
            out_rows[i] = out_rows[i].at[cur_idx].set(v_)
        t_out = out_rows[0].reshape(lead + (1,))
        hit_pos = out_rows[1].reshape(lead + (3,))
        hit_col = out_rows[2].reshape(lead + (4,))
        hit_nrm = out_rows[3].reshape(lead + (3,))

    if need_normals and not inloop_normals:
        nrm = volume.eval_normal(hit_pos, ray_dir, b=b)
        hit_nrm = jnp.where(t_out > 0, nrm, hit_nrm)
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


def make_mc_sampler(volume: Any, *, tile: int = 2048,
                    table_dtype=jnp.float32, interpret: bool = False):
    """Fused density sampler for :func:`trace_mc` / :func:`delta_tracking`
    over a ``VolumeInterpolationNetwork`` (BASELINE config 5's MC-eval
    arm off the plain path): one pallas_call per tracking round instead
    of per-sample plain-JAX MLP + XLA grid_sample gathers. Reference
    analog: the tensor-core MLP inside the delta-tracking kernel
    (renderer_ray_evaluation_monte_carlo.cuh + tensorcores.cuh:736)."""
    from ..ops.fused_eval import make_fused_eval
    return make_fused_eval(
        volume.network, np.asarray(volume.box_min),
        np.asarray(volume.box_size), time=float(volume.time),
        ensemble=float(volume.ensemble), tile=tile,
        table_dtype=table_dtype, interpret=interpret)


def trace_mc(key: Array, ray_start: Array, ray_dir: Array, volume: Any,
             tf: Any, phase: Any, config: RayEvaluationMonteCarlo,
             b: int = 0,
             ray_id: Optional[Array] = None,
             sampler: Any = None,
             use_fused: bool = False,
             fused_kwargs: Optional[dict] = None,
             compact: bool = False,
             compact_schedule: Optional[tuple] = None,
             compact_min_width: Optional[int] = None
             ) -> RayEvaluationOutput:
    """Full path-traced evaluation with next-event estimation to the
    spherical light (reference: cuh:205-313 ``eval``).

    ``ray_id`` (lead-shaped uint32, default arange): the per-ray PRNG
    counter -- all draws depend only on (key, ray_id), so a sharded
    trace with global ray ids reproduces the single-device trace to
    1-ULP elementwise rounding (multi-host determinism for the allclose
    gates, SURVEY §7; tests/test_parallel.py).

    ``use_fused=True`` (network volumes) routes every delta-tracking
    density evaluation through the fused sample evaluator
    (:func:`make_mc_sampler`); the PRNG stream is unchanged, so hit
    decisions match the plain oracle except on knife-edge draws where
    the kernel's polynomial trig (~1e-6) flips an acceptance. Measured
    on v5e at 128^2: the fused sampler wins ~1.5x end-to-end; the
    larger win for SRN MC eval is structural and always on -- normals
    are DEFERRED to the recorded interaction point (see
    :func:`delta_tracking`), removing the per-tentative-collision
    ``jax.grad`` MLP eval that dominated the per-step cost.

    ``compact=True`` enables live-ray compaction inside every
    delta-tracking walk (see :func:`delta_tracking` compact_stages --
    bitwise identical, fully in-jit) and starts each walk with only the
    rays that are still on a path (``active`` mask), so later bounces
    and shadow walks are bound by the live count instead of the batch
    width. ``compact_schedule``: explicit ((rounds, width), ...)
    override; the default compacts to N/4 after 16 rounds and N/16
    after 32 more (floored at the fused sampler's tile)."""
    dtype = ray_start.dtype
    lead = ray_start.shape[:-1]
    if ray_id is None:
        ray_id = _default_ray_id(lead)
    if sampler is None and use_fused:
        sampler = make_mc_sampler(volume, **(fused_kwargs or {}))
    stages = ()
    if compact:
        if compact_schedule is not None:
            stages = tuple(compact_schedule)
        else:
            n = 1
            for d in lead:
                n *= int(d)
            if compact_min_width is not None:
                floor_w = int(compact_min_width)
            elif use_fused or sampler is not None:
                # a fused sample evaluator processes fixed tiles: keep
                # compact widths multiples of it (callers with custom
                # tiles pass compact_min_width)
                floor_w = int((fused_kwargs or {}).get("tile", 2048))
            else:
                floor_w = 256

            def wup(w):
                return -(-max(w, floor_w) // floor_w) * floor_w
            # rounds swept on v5e at 128^2 flagship (tools/bench_mc.py):
            # (8, 16) 149 ms < (16, 32) 207 < (24, 48) 256 < none 382
            if n // 4 > floor_w:
                stages = ((8, wup(n // 4)), (16, wup(n // 16)))
            elif n > 2 * floor_w:
                stages = ((8, wup(n // 4)),)
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
                             config, b=b, ray_id=ray_id,
                             sampler=sampler,
                             active=(valid if compact else None),
                             compact_stages=stages)
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
                                b=b, ray_id=ray_id, sampler=sampler,
                                active=((valid & any_hit) if compact
                                        else None),
                                compact_stages=stages)
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
