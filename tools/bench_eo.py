"""Measure the fwd+bwd bench contract with the exact-gated early-out
on vs off (megakernel engine). One TPU process; prints both numbers."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build_flagship
from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                     fused_trace_dvr_bucketed,
                                     plan_ray_buckets)

WIDTH = HEIGHT = 512
STEPSIZE = 1.0 / 512
RAY_CHUNK = 262144
TIMED_FRAMES = 4

vol, tf, cfg = _build_flagship()
cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
matrix = np.asarray(camera_matrix(cam))
s, d = generate_rays(jnp.asarray(matrix), WIDTH, HEIGHT,
                     fov_y_radians=0.7853981633974483)
rs_np = np.asarray(s.reshape(-1, 3))
rd_np = np.asarray(d.reshape(-1, 3))
bm = np.asarray(vol.box_min)
bs = np.asarray(vol.box_size)
perm, _inv = block_ray_permutation(WIDTH, HEIGHT, 16, 16)
rs_np, rd_np = rs_np[perm], rd_np[perm]
plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEPSIZE,
                        seg=32, tile=256, n_buckets=3,
                        grid_sizes=(32, 32, 32))
ray_start = jnp.asarray(rs_np)
ray_dir = jnp.asarray(rd_np)

n_chunks = (WIDTH * HEIGHT) // RAY_CHUNK
chunks = [(ray_start[i * RAY_CHUNK:(i + 1) * RAY_CHUNK],
           ray_dir[i * RAY_CHUNK:(i + 1) * RAY_CHUNK])
          for i in range(n_chunks)]
chunks = jax.block_until_ready(chunks)


def run(eo):
    @jax.jit
    def fwd_bwd_chunk(net, tft, rs, rd):
        def loss_fn(net, tft):
            c = fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEPSIZE,
                seg=32, tile=256, enable_early_out=eo,
                differentiable=True, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine="mega")
            return jnp.mean(c ** 2)
        return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

    def run_frame():
        for rs, rd in chunks:
            loss, grads = fwd_bwd_chunk(vol.network, tf.tensor, rs, rd)
        return loss

    float(run_frame())
    t0 = time.perf_counter()
    losses = [run_frame() for _ in range(TIMED_FRAMES)]
    _ = [float(l) for l in losses]
    dt = (time.perf_counter() - t0) / TIMED_FRAMES
    mrays = WIDTH * HEIGHT / dt / 1e6
    print(f"early_out={eo}: {dt:.3f}s/frame  {mrays:.3f} Mrays/s",
          flush=True)
    return mrays


a = run(False)
b = run(True)
print(f"speedup from early-out: {b / a:.3f}x", flush=True)
