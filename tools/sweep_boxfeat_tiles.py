"""TPU sweep: (seg, tile) program shapes for the boxfeat fwd+bwd path +
backward cold-compile timing (VERDICT item 10).

Run: tools/tpurun.sh tools/sweep_boxfeat_tiles.py /tmp/sweep_tiles.log
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

from __graft_entry__ import _build_flagship
from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation, certify_boxfeat,
                                     fused_trace_dvr)
from fvsrn_tpu.raytracer.dvr import max_steps_bound

W = H = 512
STEP = 1.0 / 512

vol, tf, _ = _build_flagship()
steps = max_steps_bound(vol.box_size, STEP)
mat = np.asarray(camera_matrix(
    CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)))


@jax.jit
def mk(m):
    s, d = generate_rays(m, W, H, fov_y_radians=0.7853981633974483)
    return s.reshape(-1, 3), d.reshape(-1, 3)


rs, rd = mk(mat)
rs = np.asarray(rs)
rd = np.asarray(rd)
perm, inv = block_ray_permutation(W, H, 16, 16)
rs, rd = rs[perm], rd[perm]
bm = np.asarray(vol.box_min)
bs = np.asarray(vol.box_size)
net, tft = vol.network, tf.tensor
rs_j, rd_j = jnp.asarray(rs), jnp.asarray(rd)


def timeit(f, *args, reps=3):
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(f(*args))[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), compile_s


for seg, tile in [(32, 256), (32, 512), (64, 256), (16, 256), (64, 512)]:
    spec = certify_boxfeat(rs, rd, (32, 32, 32), bm, bs, stepsize=STEP,
                           max_steps=steps, seg=seg, tile=tile)

    @jax.jit
    def fwd(net, tft, rs, rd, seg=seg, tile=tile, spec=spec):
        return fused_trace_dvr(
            rs, rd, net, bm, bs, tft, stepsize=STEP, max_steps=steps,
            seg=seg, tile=tile, enable_early_out=True,
            latent_mode="boxfeat", table_dtype=jnp.bfloat16, subbox=spec)

    @jax.jit
    def fwdbwd(net, tft, rs, rd, seg=seg, tile=tile, spec=spec):
        def loss_fn(net, tft):
            c = fused_trace_dvr(
                rs, rd, net, bm, bs, tft, stepsize=STEP, max_steps=steps,
                seg=seg, tile=tile, enable_early_out=False,
                differentiable=True, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, subbox=spec)
            return jnp.mean(c ** 2)
        return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

    try:
        t_f, c_f = timeit(fwd, net, tft, rs_j, rd_j)
        t_b, c_b = timeit(fwdbwd, net, tft, rs_j, rd_j)
        print(f"seg={seg} tile={tile} spec={tuple(spec)}: "
              f"fwd {t_f:.3f}s ({W*H/t_f/1e6:.3f} Mrays/s, compile "
              f"{c_f:.0f}s) fwd+bwd {t_b:.3f}s ({W*H/t_b/1e6:.3f} "
              f"Mrays/s, compile {c_b:.0f}s)", flush=True)
    except Exception as e:
        print(f"seg={seg} tile={tile}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
