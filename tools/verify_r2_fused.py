"""Round-2 verify: drive the fused kernel end-to-end on the real TPU.

Covers the new paths vs the plain oracle ON DEVICE (compiled, not
interpret): density, shaded-normals (brdf), rgbo, and the sub-box latent
path; plus the standard Marschner-Lobb package-boundary render.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import fvsrn_tpu as fv
from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.ops.fused_dvr import fused_trace_dvr
from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                     max_steps_bound, trace_dvr)

SIZE = 128
STEPSIZE = 1.0 / 128


def make_scene(output_mode="density"):
    rng = np.random.default_rng(7)
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((8, 16, 16, 16)) * 0.5).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=8,
        output_mode=output_mode, latent=latent, seed=7)
    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.8, 0.3, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 12.0, 30.0], positions=[0.0, 0.5, 1.0])
    cam = fv.CameraOnASphere.make(pitch=0.35, yaw=0.7, distance=1.7)
    from fvsrn_tpu.camera import camera_matrix, generate_rays
    m = camera_matrix(cam)
    rs, rd = generate_rays(np.asarray(m), SIZE, SIZE,
                           fov_y_radians=0.7853981633974483)
    return net, tf, np.asarray(rs).reshape(-1, 3), \
        np.asarray(rd).reshape(-1, 3)


def run():
    print("devices:", jax.devices(), flush=True)
    steps = max_steps_bound((1.0, 1.0, 1.0), STEPSIZE)
    bm, bs = (-0.5, -0.5, -0.5), (1.0, 1.0, 1.0)

    # 1) fused density vs plain, compiled on TPU
    net, tf, rs, rd = make_scene()
    vol = VolumeInterpolationNetwork.make(net)
    cfg = RayEvaluationSteppingDvr.make(stepsize=STEPSIZE,
                                        enable_early_out=False)

    @jax.jit
    def plain(net, rs, rd):
        v = VolumeInterpolationNetwork.make(net)
        return trace_dvr(jnp.asarray(rs), jnp.asarray(rd), v, tf, cfg,
                         steps).color

    @jax.jit
    def fused(net, rs, rd):
        return fused_trace_dvr(
            jnp.asarray(rs), jnp.asarray(rd), net, bm, bs, tf.tensor,
            stepsize=STEPSIZE, max_steps=steps, seg=16, tile=256,
            enable_early_out=False)

    a = np.asarray(fused(net, rs, rd))
    b = np.asarray(plain(net, rs, rd))
    err = float(np.abs(a - b).max())
    print(f"fused-vs-plain density on TPU: max|diff|={err:.2e}", flush=True)
    assert err < 2e-3, err
    assert a[:, 3].max() > 0.3, "blank image"

    # 2) fused shaded normals vs plain on TPU (the reflect-fix path)
    brdf = fv.BRDFLambert.make(
        enable_phong=True, ambient=0.2, specular=0.4,
        magnitude_center=0.5, magnitude_radius=0.5,
        light=(0.3, -0.5, -1.0))
    cfgn = RayEvaluationSteppingDvr.make(
        stepsize=STEPSIZE, enable_early_out=False, need_normals=True)

    @jax.jit
    def plain_shaded(net, rs, rd):
        v = VolumeInterpolationNetwork.make(net)
        return trace_dvr(jnp.asarray(rs), jnp.asarray(rd), v, tf, cfgn,
                         steps, brdf=brdf).color

    @jax.jit
    def fused_shaded(net, rs, rd):
        return fused_trace_dvr(
            jnp.asarray(rs), jnp.asarray(rd), net, bm, bs, tf.tensor,
            stepsize=STEPSIZE, max_steps=steps, seg=16, tile=256,
            enable_early_out=False, need_normals=True, brdf=brdf).color

    a = np.asarray(fused_shaded(net, rs, rd))
    b = np.asarray(plain_shaded(net, rs, rd))
    err = float(np.abs(a - b).max())
    print(f"fused-vs-plain shaded on TPU:  max|diff|={err:.2e}", flush=True)
    assert err < 5e-3, err

    # 3) rgbo head on TPU
    net4, tf4, rs4, rd4 = make_scene("rgbo")

    @jax.jit
    def plain4(net, rs, rd):
        v = VolumeInterpolationNetwork.make(net)
        return trace_dvr(jnp.asarray(rs), jnp.asarray(rd), v, tf4, cfg,
                         steps).color

    @jax.jit
    def fused4(net, rs, rd):
        return fused_trace_dvr(
            jnp.asarray(rs), jnp.asarray(rd), net, bm, bs, tf4.tensor,
            stepsize=STEPSIZE, max_steps=steps, seg=16, tile=256,
            enable_early_out=False)

    a = np.asarray(fused4(net4, rs4, rd4))
    b = np.asarray(plain4(net4, rs4, rd4))
    err = float(np.abs(a - b).max())
    print(f"fused-vs-plain rgbo on TPU:    max|diff|={err:.2e}", flush=True)
    assert err < 2e-3, err

    # 4) standard package-boundary render (Marschner-Lobb)
    voli = fv.VolumeInterpolationImplicit.make('MARSCHNER_LOBB')
    tfi = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.8, 0.3, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 8.0, 25.0], positions=[0.0, 0.5, 1.0])
    cfgi = fv.RayEvaluationSteppingDvr.make(stepsize=1 / 256)
    cam = fv.CameraOnASphere.make(pitch=0.4, yaw=0.6, distance=1.8)
    ev = fv.ImageEvaluatorSimple(camera=cam, volume=voli, tf=tfi,
                                 ray_config=cfgi)
    stepsi = max_steps_bound(voli.box_size, 1 / 256)
    render = jax.jit(lambda e: e.render(256, 256, max_steps=stepsi))
    img = np.asarray(render(ev))
    assert img.shape == (1, 8, 256, 256) and np.isfinite(img).all()
    assert img[:, 3].max() > 0.5
    from PIL import Image
    Image.fromarray(
        (np.clip(np.moveaxis(img[0, :3], 0, -1), 0, 1) * 255
         ).astype('uint8')).save('/tmp/verify_render.png')
    print("OK", flush=True)


if __name__ == "__main__":
    run()
