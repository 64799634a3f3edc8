"""Verify the megakernel end-to-end on the real TPU (compiled, not
interpret): forward + gradients vs the plain lattice oracle, then a
flagship 256^2 render through LoadedModel's fast path (which now selects
engine="mega") with a saved image.
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
from fvsrn_tpu.ops.fused_mega import mega_trace_dvr
from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                     max_steps_bound, trace_dvr)

SIZE = 128
STEPSIZE = 1.0 / 128


def make_scene():
    rng = np.random.default_rng(7)
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((8, 16, 16, 16)) * 0.5).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=8,
        output_mode="density", latent=latent, seed=7)
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
    net, tf, rs, rd = make_scene()
    cfg = RayEvaluationSteppingDvr.make(stepsize=STEPSIZE,
                                        enable_early_out=False)

    # 1) compiled mega forward vs plain lattice oracle (certify the
    # sub-box footprint host-side; jit only the device program)
    from fvsrn_tpu.ops.fused_dvr import certify_boxfeat
    spec = certify_boxfeat(rs, rd, (16, 16, 16), bm, bs,
                           stepsize=STEPSIZE, max_steps=steps, seg=16,
                           tile=256)

    @jax.jit
    def plain(net, rs, rd):
        v = VolumeInterpolationNetwork.make(net)
        return trace_dvr(jnp.asarray(rs), jnp.asarray(rd), v, tf, cfg,
                         steps, lattice=True).color

    @jax.jit
    def mega(net, rs, rd):
        return mega_trace_dvr(
            jnp.asarray(rs), jnp.asarray(rd), net, bm, bs, tf.tensor,
            stepsize=STEPSIZE, max_steps=steps, seg=16, tile=256,
            enable_early_out=False, subbox=spec)

    a = np.asarray(mega(net, rs, rd))
    b = np.asarray(plain(net, rs, rd))
    err = float(np.abs(a - b).max())
    print(f"mega-vs-plain fwd on TPU: max|diff|={err:.2e}", flush=True)
    assert err < 2e-3, err
    assert a[:, 3].max() > 0.3, "blank image"

    # 2) compiled mega gradients vs plain oracle (weights + latent + TF)
    tgt = jnp.asarray(
        np.random.default_rng(0).random((rs.shape[0], 4)), jnp.float32)

    def loss_mega(net, tft):
        c = mega_trace_dvr(
            jnp.asarray(rs), jnp.asarray(rd), net, bm, bs, tft,
            stepsize=STEPSIZE, max_steps=steps, seg=16, tile=256,
            differentiable=True, subbox=spec)
        return jnp.mean((c - tgt) ** 2)

    def loss_plain(net, tft):
        v = VolumeInterpolationNetwork.make(net)
        c = trace_dvr(jnp.asarray(rs), jnp.asarray(rd), v,
                      fv.TransferFunctionPiecewiseLinear(tensor=tft),
                      cfg, steps, lattice=True).color
        return jnp.mean((c - tgt) ** 2)

    g_m = jax.jit(jax.grad(loss_mega, argnums=(0, 1)))(net, tf.tensor)
    g_p = jax.jit(jax.grad(loss_plain, argnums=(0, 1)))(net, tf.tensor)
    lm = jax.tree.leaves(g_m)
    lp = jax.tree.leaves(g_p)
    worst = 0.0
    for x, y in zip(lm, lp):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(1e-3, float(np.abs(y).max()))
        worst = max(worst, float(np.abs(x - y).max()) / scale)
    print(f"mega-vs-plain grad on TPU: worst rel err={worst:.2e}",
          flush=True)
    assert worst < 2e-2, worst

    # 3) flagship render through the inference fast path (engine=mega)
    from __graft_entry__ import _build_flagship
    from fvsrn_tpu.inference import LoadedModel
    vol, tff, cfgf = _build_flagship()
    lm_ = LoadedModel(vol.network, tff, cfgf)
    cam = fv.CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    render = lm_.prepare_network_render(cam, 256, 256, mode="FUSED")
    t0 = time.time()
    img = np.asarray(render())
    print(f"flagship fused render (incl compile): {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    img = np.asarray(render())
    print(f"flagship fused render (warm): {time.time()-t0:.2f}s",
          flush=True)
    assert np.isfinite(img).all()
    assert img[..., 3].max() > 0.3, "blank flagship render"
    from PIL import Image
    Image.fromarray(
        (np.clip(img[..., :3], 0, 1) * 255).astype("uint8")).save(
            "/tmp/verify_mega.png")
    print("OK", flush=True)


if __name__ == "__main__":
    run()
