"""Image evaluator: full-frame rendering entry point.

Rebuild of ``ImageEvaluatorSimple``
(reference: renderer/image_evaluator_simple.cpp:198-361 and the device kernel
renderer/renderer_image_evaluator_simple.cuh:36-127): selects camera + volume
+ ray evaluator, runs the pixel loop, and returns a (B, 8, H, W) tensor with
channels [r, g, b, alpha, normal_x, normal_y, normal_z, depth].

On TPU the "pixel loop" is just array programming: rays for all pixels are
generated in one shot and the ray evaluator is applied to the flattened ray
set; XLA fuses camera + march + compositing into one program, replacing the
NVRTC kernel assembly of the reference.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import Array

from .. import camera as camera_mod
from ..utils.pytree import static_field, struct
from .dvr import RayEvaluationOutput, max_steps_bound, trace_dvr
from .iso import trace_iso
from .montecarlo import trace_mc


@struct
class ImageEvaluatorSimple:
    """Container module wiring camera, volume, TF, BRDF and ray evaluator.

    Mirrors the module tree of the reference
    (reference: renderer/imodule.h:83-130 module hierarchy;
    image_evaluator_simple.h). ``ray_mode`` selects the ray evaluation:
    'dvr' | 'iso' (monte-carlo lives in raytracer/montecarlo.py).
    """
    camera: Any
    volume: Any
    tf: Any
    ray_config: Any
    brdf: Any = None
    phase: Any = None  # phase function for ray_mode='mc'
    samples: int = static_field(default=1)  # supersamples per pixel
    ray_mode: str = static_field(default="dvr")

    def render(self, width: int, height: int, *,
               max_steps: Optional[int] = None,
               background: Optional[Array] = None,
               key: Optional[Array] = None) -> Array:
        return render_image(self, width, height, max_steps=max_steps,
                            background=background, key=key)


def _batch_of(module) -> int:
    return getattr(module, "batch", 1)


def render_image(ev: ImageEvaluatorSimple, width: int, height: int, *,
                 max_steps: Optional[int] = None,
                 background: Optional[Array] = None,
                 key: Optional[Array] = None) -> Array:
    """Render a (B, 8, H, W) image.

    Supersampling jitters the pixel position per sample
    (reference: renderer_image_evaluator_simple.cuh:75-82) and averages:
    color/normal by sample count, depth by accumulated alpha (:106-109).
    ``background``: optional (1, 5, H, W) rgba+depth image from a
    rasterization pre-pass; rays terminate at its depth where alpha > 0.
    """
    cam = ev.camera
    if max_steps is None and ev.ray_mode != "mc":
        max_steps = max_steps_bound(ev.volume.box_size, ev.ray_config.stepsize)

    batch = max(_batch_of(cam), _batch_of(ev.volume), _batch_of(ev.tf))

    jitter = None
    if ev.samples > 1:
        if key is None:
            key = jax.random.PRNGKey(42)
        jitter = jax.random.uniform(
            key, (ev.samples, height, width, 2), jnp.float32)
        # the multisampling kernel centers samples around the pixel center
        # via (x + u - 0.5) + 0.5 = x + u
    ray_start, ray_dir = camera_mod.generate_rays(
        cam, width, height, jitter=jitter)
    # with supersampling the sample axis occupies the batch axis (reference:
    # camera.cpp:131-141); rendering batches stay 1 in that case.
    nbatch = ray_start.shape[0]

    tmax_in = None
    if background is not None:
        bg_alpha = background[:, 3:4]
        bg_depth = background[:, 4:5]
        tmax_map = jnp.where(bg_alpha > 0, bg_depth, jnp.inf)
        tmax_in = jnp.moveaxis(tmax_map, 1, -1)  # (1, H, W, 1)

    def trace_one(b: int, rs: Array, rd: Array) -> RayEvaluationOutput:
        if ev.ray_mode == "dvr":
            return trace_dvr(rs, rd, ev.volume, ev.tf, ev.ray_config,
                             max_steps, brdf=ev.brdf,
                             tmax_in=tmax_in[0] if tmax_in is not None else None,
                             b=b)
        elif ev.ray_mode == "iso":
            return trace_iso(rs, rd, ev.volume, ev.ray_config, max_steps, b=b)
        elif ev.ray_mode == "mc":
            # path tracing needs a sampler key (reference:
            # IMAGE_EVALUATOR__REQUIRES_SAMPLER,
            # renderer_image_evaluator_simple.cuh:46-47)
            k = key if key is not None else jax.random.PRNGKey(42)
            k = jax.random.fold_in(k, b)
            return trace_mc(k, rs, rd, ev.volume, ev.tf, ev.phase,
                            ev.ray_config, b=b)
        raise ValueError(f"unknown ray mode {ev.ray_mode}")

    outs = []
    for b in range(nbatch if ev.samples == 1 else ev.samples):
        vb = min(b, batch - 1) if ev.samples == 1 else 0
        outs.append(trace_one(vb, ray_start[b], ray_dir[b]))
    color = jnp.stack([o.color for o in outs])    # (B, H, W, 4)
    normal = jnp.stack([o.normal for o in outs])
    depth = jnp.stack([o.depth for o in outs])

    if ev.samples > 1:
        # sample combination (reference: image_evaluator_simple.cuh:100-109)
        w = color[..., 3:4]
        color_sum = jnp.sum(color, axis=0, keepdims=True)
        normal_sum = jnp.sum(normal * w, axis=0, keepdims=True)
        depth_sum = jnp.sum(depth * w, axis=0, keepdims=True)
        depth = depth_sum / jnp.maximum(color_sum[..., 3:4], 1e-20)
        color = color_sum / ev.samples
        normal = normal_sum / ev.samples

    if background is not None:
        bg = jnp.moveaxis(background[:, :4], 1, -1)
        acc_a = color[..., 3:4]
        color = jnp.concatenate([
            color[..., :3] + (1 - acc_a) * bg[..., :3] * bg[..., 3:4],
            acc_a + (1 - acc_a) * bg[..., 3:4],
        ], axis=-1)

    out = jnp.concatenate([color, normal, depth], axis=-1)  # (B,H,W,8)
    return jnp.moveaxis(out, -1, 1)  # (B, 8, H, W)


class ProgressiveRenderer:
    """Accumulate-over-frames refinement of stochastic renders
    (reference: the image evaluator's ``refine`` flag + refine-blend,
    iimage_evaluator.h:43-71, image_evaluator_simple.cpp:288-358: the
    GUI re-renders between interactions and folds each pass into the
    displayed image).

    Each :meth:`refine` call renders one more pass with a fresh PRNG
    key (``fold_in(key, frame)``) and folds it into running sums;
    :attr:`image` is the running MEAN -- for Monte-Carlo renders the
    pixel variance falls as 1/frames (tests/test_mc.py). Channel
    semantics match the supersampling combiner
    (renderer_image_evaluator_simple.cuh:100-109): color averaged by
    frame count, normals/depth weighted by per-pass alpha.

    One jitted step is compiled per renderer; the frame index and sums
    are traced arguments, so every refinement reuses it.
    """

    def __init__(self, evaluator: ImageEvaluatorSimple, width: int,
                 height: int, *, key=None,
                 max_steps: Optional[int] = None):
        self.evaluator = evaluator
        self.width = width
        self.height = height
        self.key = key if key is not None else jax.random.PRNGKey(42)
        if max_steps is None and evaluator.ray_mode != "mc":
            max_steps = max_steps_bound(evaluator.volume.box_size,
                                        evaluator.ray_config.stepsize)

        @jax.jit
        def step(ev, sums, frame, key):
            img = render_image(ev, width, height,
                               max_steps=max_steps,
                               key=jax.random.fold_in(key, frame))
            w = img[:, 3:4]
            pass_sums = jnp.concatenate(
                [img[:, :4], img[:, 4:7] * w, img[:, 7:8] * w], axis=1)
            return sums + pass_sums

        self._step = step
        self.reset()

    def reset(self):
        self._sums = jnp.zeros((max(_batch_of(self.evaluator.camera), 1),
                                8, self.height, self.width), jnp.float32)
        self.frames = 0

    def refine(self, frames: int = 1):
        """Render ``frames`` more passes into the accumulator; returns
        the current running-mean image (B, 8, H, W)."""
        for _ in range(frames):
            self._sums = self._step(self.evaluator, self._sums,
                                    self.frames, self.key)
            self.frames += 1
        return self.image

    @property
    def image(self) -> Array:
        """Running mean (B, 8, H, W) over the accumulated passes."""
        n = max(self.frames, 1)
        s = self._sums
        alpha = jnp.maximum(s[:, 3:4], 1e-20)
        return jnp.concatenate(
            [s[:, :4] / n, s[:, 4:7] / alpha, s[:, 7:8] / alpha], axis=1)


def extract_color(image: Array, tonemapping: bool = False,
                  max_exposure: float = 1.0) -> Array:
    """(B, 8, H, W) -> (B, 4, H, W) rgba, optional simple exposure tonemap
    (reference: iimage_evaluator.h:191-246 ``ExtractColor``/``Tonemapping``)."""
    rgba = image[:, :4]
    if tonemapping:
        rgb = rgba[:, :3] / max_exposure
        rgba = jnp.concatenate([jnp.clip(rgb, 0.0, 1.0), rgba[:, 3:4]], axis=1)
    return rgba
