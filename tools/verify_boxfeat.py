"""On-TPU verify: package-boundary render + compiled boxfeat gates.

1. Standard Marschner-Lobb render through ImageEvaluatorSimple (the
   verify-skill recipe) -> /tmp/verify_render.png.
2. Compiled (non-interpret) boxfeat fused render at 128^2 vs the plain
   lattice-mode oracle on the SAME device, f32 table: allclose gate.
3. Compiled boxfeat fwd+bwd gradient gate vs jax.grad of the oracle.

Run via: tools/tpurun.sh tools/verify_boxfeat.py /tmp/verify_boxfeat.log
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import fvsrn_tpu as fv
from fvsrn_tpu.camera import camera_matrix, generate_rays
from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation, certify_boxfeat,
                                     fused_trace_dvr)
from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                     max_steps_bound, trace_dvr)

# ---- 1. package-boundary render --------------------------------------
vol = fv.VolumeInterpolationImplicit.make('MARSCHNER_LOBB')
tfm = fv.TransferFunctionPiecewiseLinear.make(
    rgb=[[0.1, 0.1, 0.8], [0.8, 0.3, 0.1], [1.0, 1.0, 0.6]],
    opacity=[0.0, 8.0, 25.0], positions=[0.0, 0.5, 1.0])
cfg = fv.RayEvaluationSteppingDvr.make(stepsize=1 / 256)
cam = fv.CameraOnASphere.make(pitch=0.4, yaw=0.6, distance=1.8)
ev = fv.ImageEvaluatorSimple(camera=cam, volume=vol, tf=tfm,
                             ray_config=cfg)
steps = max_steps_bound(vol.box_size, 1 / 256)
render = jax.jit(lambda e: e.render(256, 256, max_steps=steps))
a = np.asarray(render(ev))
t0 = time.time()
a = np.asarray(render(ev))
print('render %.3fs' % (time.time() - t0), flush=True)
assert a.shape == (1, 8, 256, 256) and np.isfinite(a).all() \
    and a[:, 3].max() > 0.5
from PIL import Image
Image.fromarray((np.clip(np.moveaxis(a[0, :3], 0, -1), 0, 1)
                 * 255).astype('uint8')).save('/tmp/verify_render.png')
print('render OK', flush=True)

# ---- 2./3. compiled boxfeat gates ------------------------------------
rng = np.random.default_rng(7)
latent = LatentSpace(static_grid=jnp.asarray(
    (rng.standard_normal((16, 32, 32, 32)) * 0.3).astype(np.float32)))
net = SceneRepresentationNetwork.make(
    layers="32:32:32", activation="SnakeAlt:2", num_fourier=14,
    output_mode="density:direct", latent=latent, seed=3)
tf2 = fv.TransferFunctionPiecewiseLinear.make(
    rgb=[[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9]],
    opacity=[2.0, 10.0, 30.0], positions=[0.0, 0.45, 1.0])
W = H = 128
stepsize = 1.0 / 256
msteps = max_steps_bound((1.0, 1.0, 1.0), stepsize)
mat = np.asarray(camera_matrix(fv.CameraOnASphere.make(
    pitch=0.3, yaw=0.8, distance=1.7)))
rs, rd = generate_rays(mat, W, H, fov_y_radians=0.7853981633974483)
rs = np.asarray(rs.reshape(-1, 3))
rd = np.asarray(rd.reshape(-1, 3))
perm, inv = block_ray_permutation(W, H, 16, 16)
rs_b, rd_b = rs[perm], rd[perm]
spec = certify_boxfeat(rs_b, rd_b, (32, 32, 32), (-.5, -.5, -.5),
                       (1., 1., 1.), stepsize=stepsize, max_steps=msteps,
                       seg=32, tile=256)
print("spec:", spec, flush=True)

voln = VolumeInterpolationNetwork.make(net)
dcfg = RayEvaluationSteppingDvr.make(stepsize=stepsize,
                                     enable_early_out=False)


@jax.jit
def oracle(net_, tft):
    voln_ = VolumeInterpolationNetwork.make(net_)
    import dataclasses
    tfo = dataclasses.replace(tf2, tensor=tft)
    return trace_dvr(jnp.asarray(rs_b), jnp.asarray(rd_b), voln_, tfo,
                     dcfg, msteps, lattice=True,
                     checkpoint_chunk=1).color


@jax.jit
def fused(net_, tft):
    return fused_trace_dvr(
        jnp.asarray(rs_b), jnp.asarray(rd_b), net_, (-.5, -.5, -.5),
        (1., 1., 1.), tft, stepsize=stepsize, max_steps=msteps,
        seg=32, tile=256, enable_early_out=False, latent_mode="boxfeat",
        subbox=spec)


ref = np.asarray(oracle(net, tf2.tensor))
got = np.asarray(fused(net, tf2.tensor))
err = float(np.abs(got - ref).max())
print(f"boxfeat fwd gate: max|diff| = {err:.3e}", flush=True)
assert err < 2e-3, err

tgt = jnp.asarray(rng.random((rs_b.shape[0], 4)).astype(np.float32))


@jax.jit
def g_fused(net_, tft):
    def loss(net_, tft):
        c = fused_trace_dvr(
            jnp.asarray(rs_b), jnp.asarray(rd_b), net_, (-.5, -.5, -.5),
            (1., 1., 1.), tft, stepsize=stepsize, max_steps=msteps,
            seg=32, tile=256, enable_early_out=False,
            differentiable=True, latent_mode="boxfeat", subbox=spec)
        return jnp.mean((c - tgt) ** 2)
    return jax.grad(loss, argnums=(0, 1))(net_, tft)


@jax.jit
def g_oracle(net_, tft):
    def loss(net_, tft):
        return jnp.mean((oracle.__wrapped__(net_, tft) - tgt) ** 2)
    return jax.grad(loss, argnums=(0, 1))(net_, tft)


gf = g_fused(net, tf2.tensor)
go = g_oracle(net, tf2.tensor)
gfg = np.asarray(gf[0].latent.static_grid)
gog = np.asarray(go[0].latent.static_grid)
scale = np.abs(gog).max() + 1e-12
err_g = float(np.abs(gfg - gog).max() / scale)
print(f"boxfeat bwd latent-grid gate: rel max|diff| = {err_g:.3e}",
      flush=True)
assert err_g < 5e-3, err_g
w_f = np.asarray(gf[0].layers[0].weight)
w_o = np.asarray(go[0].layers[0].weight)
err_w = float(np.abs(w_f - w_o).max() / (np.abs(w_o).max() + 1e-12))
print(f"boxfeat bwd layer0 gate: rel max|diff| = {err_w:.3e}", flush=True)
assert err_w < 5e-3, err_w
print('ALL GATES OK', flush=True)
