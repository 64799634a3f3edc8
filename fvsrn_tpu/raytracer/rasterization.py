"""Rasterization pre-pass: particles / streamlines composited before rays.

Rebuild of the reference's rasterization tower
(reference: renderer/irasterization.h:15-46 ``IRasterization``/
``RasterizationContainer`` and renderer/particle_integration.h:14
``ParticleIntegration``): opaque geometry is rendered to an rgba+depth
image first, and the ray marcher terminates at its depth
(reference: renderer_image_evaluator_simple.cuh:61-71).

The reference uses OpenGL; here the pre-pass is a depth-buffered point
splatter in pure JAX (no GL in a TPU pod), and particle tracing through a
velocity volume replaces the CUDA streamline integrator. The output
(1, 5, H, W) [rgba + depth] plugs directly into
``ImageEvaluatorSimple.render(background=...)``.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..camera import CameraOnASphere, camera_matrix
from ..utils.pytree import static_field, struct
from ..utils.vecmath import cross, normalize


@struct
class ParticleIntegration:
    """Trace particles through a velocity field and rasterize them
    (reference: particle_integration.h:14: seeded particles advected
    through the velocity volume, drawn as points/lines)."""
    seeds: Array                     # (P, 3) world-space seed points
    color: Array = None              # (4,) rgba
    steps: int = static_field(default=32)
    dt: float = static_field(default=0.01)
    method: str = static_field(default="rk4")  # 'euler' | 'rk4'
    point_radius: int = static_field(default=1)

    @classmethod
    def make(cls, seeds, color=(1.0, 1.0, 1.0, 1.0), steps=32, dt=0.01,
             method="rk4", point_radius=1):
        return cls(seeds=np.asarray(seeds, np.float32),
                   color=np.asarray(color, np.float32), steps=steps,
                   dt=dt, method=method, point_radius=point_radius)

    def trace(self, velocity_fn) -> Array:
        """Integrate streamlines: returns (P, steps+1, 3) positions.
        ``velocity_fn(pos (N,3)) -> (N,3)`` world-space velocities."""
        def step(pos, _):
            if self.method == "euler":
                nxt = pos + self.dt * velocity_fn(pos)
            else:  # RK4
                k1 = velocity_fn(pos)
                k2 = velocity_fn(pos + 0.5 * self.dt * k1)
                k3 = velocity_fn(pos + 0.5 * self.dt * k2)
                k4 = velocity_fn(pos + self.dt * k3)
                nxt = pos + self.dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
            return nxt, nxt

        p0 = jnp.asarray(self.seeds, jnp.float32)
        _, traj = jax.lax.scan(step, p0, None, length=self.steps)
        return jnp.concatenate([p0[None], traj], axis=0).swapaxes(0, 1)


def project_points(points: Array, camera: CameraOnASphere,
                   width: int, height: int):
    """World points -> (pixel_x, pixel_y, depth) under the reference-frame
    camera (the inverse of ray generation, renderer_camera.cuh:33-52)."""
    m = camera_matrix(camera)[0]
    eye, right, up = m[0], m[1], m[2]
    front = cross(up, right)
    rel = points - eye
    depth = rel @ front
    tan_y = float(np.tan(camera.fov_y_radians / 2))
    tan_x = tan_y * width / height
    ndc_x = (rel @ right) / (depth * tan_x)
    ndc_y = (rel @ up) / (depth * tan_y)
    px = (ndc_x + 1) * width / 2 - 0.5
    py = (ndc_y + 1) * height / 2 - 0.5
    return px, py, depth


def rasterize_points(points: Array, colors: Array,
                     camera: CameraOnASphere, width: int,
                     height: int, point_radius: int = 1) -> Array:
    """Depth-buffered point splatting -> (1, 5, H, W) rgba+depth
    (nearest point wins, like the reference's opaque GL pass +
    depth copy, image_evaluator_simple.cpp:208-246)."""
    px, py, depth = project_points(points, camera, width, height)
    valid = depth > 1e-4
    ix = jnp.round(px).astype(jnp.int32)
    iy = jnp.round(py).astype(jnp.int32)

    big = jnp.float32(1e10)
    flat_depth = jnp.full((height * width,), big)
    flat_rgba = jnp.zeros((height * width, 4))
    offsets = range(-point_radius + 1, point_radius)
    for dy in offsets:
        for dx in offsets:
            x = ix + dx
            y = iy + dy
            ok = valid & (x >= 0) & (x < width) & (y >= 0) & (y < height)
            idx = jnp.where(ok, y * width + x, 0)
            d = jnp.where(ok, depth, big)
            # nearest-wins z-buffer via scatter-min then color match
            flat_depth = flat_depth.at[idx].min(d, mode="drop")
    for dy in offsets:
        for dx in offsets:
            x = ix + dx
            y = iy + dy
            ok = valid & (x >= 0) & (x < width) & (y >= 0) & (y < height)
            idx = jnp.where(ok, y * width + x, 0)
            won = ok & (depth <= flat_depth[idx] + 1e-6)
            # only winners scatter; losers are routed out of bounds and
            # dropped (a read-modify-write with duplicate indices would
            # overwrite winners with stale values)
            idx_w = jnp.where(won, idx, height * width)
            flat_rgba = flat_rgba.at[idx_w].set(colors, mode="drop")
    depth_img = jnp.where(flat_depth >= big, 0.0, flat_depth)
    img = jnp.concatenate([flat_rgba, depth_img[:, None]], axis=1)
    return img.reshape(height, width, 5).transpose(2, 0, 1)[None]


def rasterize_particles(particles: ParticleIntegration, velocity_fn,
                        camera: CameraOnASphere, width: int,
                        height: int) -> Array:
    """Streamline trace + splat of every trajectory point
    -> (1, 5, H, W) background for the image evaluator."""
    traj = particles.trace(velocity_fn)          # (P, S+1, 3)
    pts = traj.reshape(-1, 3)
    colors = jnp.broadcast_to(jnp.asarray(particles.color),
                              (pts.shape[0], 4))
    return rasterize_points(pts, colors, camera, width, height,
                            particles.point_radius)
