"""Rasterization pre-pass tests (reference: renderer/irasterization.h,
particle_integration.h; depth-limited ray marching,
renderer_image_evaluator_simple.cuh:61-71)."""
import numpy as np
import jax.numpy as jnp

from fvsrn_tpu.camera import CameraOnASphere
from fvsrn_tpu.raytracer.dvr import RayEvaluationSteppingDvr
from fvsrn_tpu.raytracer.evaluator import ImageEvaluatorSimple
from fvsrn_tpu.raytracer.rasterization import (
    ParticleIntegration, project_points, rasterize_particles,
    rasterize_points)
from fvsrn_tpu.transfer import TransferFunctionIdentity
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def test_particle_trace_constant_field():
    p = ParticleIntegration.make(seeds=[[0.0, 0.0, 0.0]], steps=10,
                                 dt=0.1)
    traj = np.asarray(p.trace(lambda x: jnp.ones_like(x)))
    assert traj.shape == (1, 11, 3)
    np.testing.assert_allclose(traj[0, -1], [1.0, 1.0, 1.0], atol=1e-5)


def test_particle_trace_rk4_circular():
    """RK4 keeps a circular orbit (v = (-y, x, 0)) much better than the
    euler integrator over a full period."""
    def v(x):
        return jnp.stack([-x[:, 1], x[:, 0], jnp.zeros_like(x[:, 0])],
                         axis=1)
    seeds = [[1.0, 0.0, 0.0]]
    n = 200
    dt = 2 * np.pi / n
    rk = ParticleIntegration.make(seeds, steps=n, dt=dt, method="rk4")
    eu = ParticleIntegration.make(seeds, steps=n, dt=dt, method="euler")
    r_rk = np.linalg.norm(np.asarray(rk.trace(v))[0, -1, :2])
    r_eu = np.linalg.norm(np.asarray(eu.trace(v))[0, -1, :2])
    assert abs(r_rk - 1.0) < 1e-4
    assert abs(r_eu - 1.0) > 0.05


def test_project_points_center():
    cam = CameraOnASphere.make(distance=2.0)
    px, py, depth = project_points(jnp.zeros((1, 3)), cam, 64, 64)
    # the look-at center projects to the image center
    np.testing.assert_allclose(float(px[0]), 31.5, atol=0.01)
    np.testing.assert_allclose(float(py[0]), 31.5, atol=0.01)
    np.testing.assert_allclose(float(depth[0]), 2.0, atol=1e-5)


def test_rasterize_depth_buffer():
    cam = CameraOnASphere.make(distance=2.0)
    # two points on the same ray (center pixel) + one offset point
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0],
                       [0.0, 0.3, 0.0]])
    cols = jnp.asarray([[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 1.0],
                        [0.0, 0.0, 1.0, 1.0]])
    img = np.asarray(rasterize_points(pts, cols, cam, 32, 32,
                                      point_radius=1))
    assert img.shape == (1, 5, 32, 32)
    center = img[0, :, 15:17, 15:17]
    assert center[3].max() == 1.0  # alpha written
    # camera at (-2,0,0): the x=0 point is NEARER than x=0.3; at the
    # center pixel (px=py=15.5 -> rounds to 16) red must win the z-buffer
    flat = img[0, :, 16, 16]
    assert flat[0] == 1.0 and flat[1] == 0.0
    np.testing.assert_allclose(flat[4], 2.0, atol=1e-4)
    assert (img[0, 4] > 0).sum() >= 2  # depth for both pixel locations


def test_background_terminates_rays():
    """A rasterized opaque splat in front of the volume shows through
    where the volume is transparent and limits marching depth."""
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionIdentity.make(absorption=0.0)  # fully transparent
    cfg = RayEvaluationSteppingDvr.make(stepsize=0.05)
    cam = CameraOnASphere.make(distance=2.0)
    p = ParticleIntegration.make(seeds=[[0.0, 0.0, 0.0]], steps=1,
                                 dt=0.0, point_radius=2)
    bg = rasterize_particles(p, lambda x: jnp.zeros_like(x), cam, 16, 16)
    ev = ImageEvaluatorSimple(camera=cam, volume=vol, tf=tf,
                              ray_config=cfg)
    img = np.asarray(ev.render(16, 16, background=bg))
    # the splat's color survives through the transparent volume
    assert img[0, 3].max() > 0.9  # alpha from background compositing
