"""DVR ray evaluator tests against an independent numpy marcher
(the oracle mirrors applications/volnet/raytracing.py:275-329 /
renderer_ray_evaluation_stepping_dvr.cuh:49-158 semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvsrn_tpu import blending
from fvsrn_tpu.camera import CameraOnASphere, generate_rays
from fvsrn_tpu.raytracer.dvr import (
    RayEvaluationSteppingDvr, max_steps_bound, trace_dvr)
from fvsrn_tpu.raytracer.evaluator import ImageEvaluatorSimple
from fvsrn_tpu.transfer import (
    TransferFunctionIdentity, TransferFunctionPiecewiseLinear)
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def _np_dvr_oracle(start, direction, density_fn, tf_rgba_fn, box_min,
                   box_size, stepsize, dmin, dmax, max_steps,
                   blend="beer_lambert"):
    """Independent scalar-loop marcher."""
    n = start.shape[0]
    inv_dir = 1.0 / direction
    t1 = (box_min - start) * inv_dir
    t2 = (box_min + box_size - start) * inv_dir
    tmin = np.maximum(np.minimum(t1, t2).max(axis=1), 0.0)
    tmax = np.maximum(t1, t2).min(axis=1)
    rgb = np.zeros((n, 3))
    alpha = np.zeros(n)
    for i in range(max_steps):
        t = tmin + i * stepsize
        valid = t <= tmax
        pos = start + direction * t[:, None]
        val = density_fn(pos)
        d2 = (val - dmin) / (dmax - dmin)
        require = valid & (val >= dmin)
        color = tf_rgba_fn(np.clip(d2, 0, 1))
        color[:, 3] *= stepsize
        color[~require] = 0
        ca = 1 - np.exp(-color[:, 3]) if blend == "beer_lambert" \
            else np.minimum(1, color[:, 3])
        contribute = valid & (color[:, 3] > 0)
        w = np.where(contribute, (1 - alpha) * ca, 0.0)
        rgb += w[:, None] * color[:, :3]
        alpha += np.where(contribute, (1 - alpha) * ca, 0.0)
    return rgb, alpha


def _sphere_density(pos):
    return 1.0 - np.linalg.norm((pos + 0.5) * 2 - 1.0, axis=-1)


def test_dvr_matches_numpy_oracle():
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionIdentity.make(absorption=10.0, emission=1.0)
    cfg = RayEvaluationSteppingDvr.make(
        stepsize=0.02, density_min=0.2, density_max=1.0,
        enable_early_out=False)
    cam = CameraOnASphere.make(distance=1.5)
    start, direction = generate_rays(cam, 16, 16)
    start = np.asarray(start).reshape(-1, 3).astype(np.float64)
    direction = np.asarray(direction).reshape(-1, 3).astype(np.float64)

    steps = max_steps_bound(vol.box_size, 0.02)
    out = trace_dvr(jnp.asarray(start, jnp.float32),
                    jnp.asarray(direction, jnp.float32),
                    vol, tf, cfg, steps)

    def tf_fn(d):
        c = np.empty(d.shape + (4,))
        c[..., 0] = c[..., 1] = c[..., 2] = d * 1.0
        c[..., 3] = d * 10.0
        return c

    rgb, alpha = _np_dvr_oracle(
        start, direction, _sphere_density, tf_fn,
        np.asarray(vol.box_min, np.float64),
        np.asarray(vol.box_size, np.float64),
        0.02, 0.2, 1.0, steps)
    got = np.asarray(out.color)
    np.testing.assert_allclose(got[:, :3], rgb, atol=2e-4)
    np.testing.assert_allclose(got[:, 3], alpha, atol=2e-4)
    # something actually got rendered
    assert alpha.max() > 0.5


def test_dvr_early_out_consistent():
    """Early-out must not change the image beyond the alpha threshold's
    truncation error (it only skips nearly-saturated tails)."""
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionIdentity.make(absorption=50.0)
    cam = CameraOnASphere.make(distance=1.5)
    start, direction = generate_rays(cam, 8, 8)
    s = jnp.reshape(start, (-1, 3))
    d = jnp.reshape(direction, (-1, 3))
    steps = max_steps_bound(vol.box_size, 0.01)
    cfg_on = RayEvaluationSteppingDvr.make(stepsize=0.01, alpha_early_out=0.999)
    cfg_off = cfg_on.replace(enable_early_out=False)
    a = np.asarray(trace_dvr(s, d, vol, tf, cfg_on, steps).color)
    b = np.asarray(trace_dvr(s, d, vol, tf, cfg_off, steps).color)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_dvr_differentiable():
    """Gradients flow to TF parameters and camera (the reference verifies
    this via gradcheck, applications/volnet/test_raytracing.py)."""
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1.0, 0.2, 0.2], [0.2, 0.2, 1.0]],
        opacity=[0.0, 20.0], positions=[0.0, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=0.05)
    cam = CameraOnASphere.make(distance=1.5)
    start, direction = generate_rays(cam, 8, 8)
    s = jnp.reshape(start, (-1, 3))
    d = jnp.reshape(direction, (-1, 3))
    steps = max_steps_bound(vol.box_size, 0.05)

    def loss(tf_tensor):
        out = trace_dvr(s, d, vol,
                        TransferFunctionPiecewiseLinear(tensor=tf_tensor),
                        cfg, steps)
        return jnp.mean(out.color ** 2)

    g = jax.grad(loss)(tf.tensor)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)[..., :4]).max() > 0

    # finite-difference check on one entry (check_adjoint.h-style harness)
    eps = 1e-3
    t0 = np.asarray(tf.tensor)
    tp = t0.copy(); tp[1, 3] += eps
    tm = t0.copy(); tm[1, 3] -= eps
    fd = (loss(jnp.asarray(tp)) - loss(jnp.asarray(tm))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[1, 3], fd, rtol=2e-2)


def test_image_evaluator_output_shape():
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionIdentity.make(absorption=10.0)
    cfg = RayEvaluationSteppingDvr.make(stepsize=0.02, need_normals=True)
    cam = CameraOnASphere.make(distance=1.5)
    ev = ImageEvaluatorSimple(camera=cam, volume=vol, tf=tf, ray_config=cfg)
    img = ev.render(24, 16)
    assert img.shape == (1, 8, 16, 24)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a[:, 3].max() > 0.1  # alpha
    assert np.abs(a[:, 4:7]).max() > 0  # normals present
