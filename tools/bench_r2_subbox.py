"""Round-2 TPU measurement: sub-box latent path vs round-1 table path.

Flagship config (32:32:32 SnakeAlt:2, 14 fourier, 32^3 x 16ch latent
grid) at 512^2, stepsize 1/512 -- the reference timing config
(eval_VolumetricFeatures.py:147-156). Rays are block-permuted into
16x16 pixel tiles (the sub-box precondition).

Run via: tools/tpurun.sh tools/bench_r2_subbox.py /tmp/bench_r2.log
"""
import json
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
from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation, certify_subbox,
                                     fused_trace_dvr)
from fvsrn_tpu.raytracer.dvr import max_steps_bound

WIDTH = HEIGHT = 512
STEPSIZE = 1.0 / 512
SEG, TILE = 32, 256


def timeit(f, *args, reps=2):
    out = f(*args)
    jax.tree_util.tree_map(np.asarray, out)   # materialize (tunnel-safe)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    return float(np.mean(ts))


def main():
    vol, tf, cfg = _build_flagship()
    steps = max_steps_bound(vol.box_size, STEPSIZE)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))

    @jax.jit
    def make_rays(matrix):
        s, d = generate_rays(matrix, WIDTH, HEIGHT,
                             fov_y_radians=0.7853981633974483)
        return s.reshape(-1, 3), d.reshape(-1, 3)

    rs, rd = make_rays(matrix)
    rs = np.asarray(rs)
    rd = np.asarray(rd)
    perm, inv = block_ray_permutation(WIDTH, HEIGHT, 16, 16)
    rs_b, rd_b = rs[perm], rd[perm]

    bm = np.asarray(vol.box_min)
    bs = np.asarray(vol.box_size)
    t0 = time.time()
    sizes = certify_subbox(rs_b, rd_b, (32, 32, 32), bm, bs,
                           stepsize=STEPSIZE, max_steps=steps,
                           seg=SEG, tile=TILE)
    print(f"certified subbox sizes: {sizes} ({time.time()-t0:.1f}s)",
          flush=True)

    def make_fns(subbox):
        @jax.jit
        def fwd(net, tft, rs, rd):
            return fused_trace_dvr(
                rs, rd, net, bm, bs, tft, stepsize=STEPSIZE,
                max_steps=steps, seg=SEG, tile=TILE,
                enable_early_out=True, differentiable=False,
                latent_mode="table", table_dtype=jnp.bfloat16,
                subbox=subbox)

        @jax.jit
        def fwdbwd(net, tft, rs, rd):
            def loss_fn(net, tft):
                c = fused_trace_dvr(
                    rs, rd, net, bm, bs, tft, stepsize=STEPSIZE,
                    max_steps=steps, seg=SEG, tile=TILE,
                    enable_early_out=False, differentiable=True,
                    latent_mode="table", table_dtype=jnp.bfloat16,
                    subbox=subbox)
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        return fwd, fwdbwd

    net, tft = vol.network, tf.tensor
    results = {}
    for name, sb, (prs, prd) in [("subbox", sizes, (rs_b, rd_b)),
                                 ("table", 0, (rs, rd))]:
        fwd, fwdbwd = make_fns(sb)
        t_f = timeit(fwd, net, tft, prs, prd)
        print(f"{name} fwd: {t_f:.3f}s = "
              f"{WIDTH*HEIGHT/t_f/1e6:.3f} Mrays/s", flush=True)
        t_fb = timeit(fwdbwd, net, tft, prs, prd)
        print(f"{name} fwd+bwd: {t_fb:.3f}s = "
              f"{WIDTH*HEIGHT/t_fb/1e6:.3f} Mrays/s", flush=True)
        results[name] = {"fwd_s": t_f, "fwdbwd_s": t_fb,
                         "fwd_mrays": WIDTH * HEIGHT / t_f / 1e6,
                         "fwdbwd_mrays": WIDTH * HEIGHT / t_fb / 1e6}
    print(json.dumps(results), flush=True)

    # numeric gate: fused subbox vs table forward agree on-device
    fwd_sb, _ = make_fns(sizes)
    fwd_tb, _ = make_fns(0)
    a = np.asarray(fwd_sb(net, tft, rs_b, rd_b))[np.asarray(inv)]
    b = np.asarray(fwd_tb(net, tft, rs, rd))
    err = float(np.max(np.abs(a - b)))
    print(f"subbox-vs-table max|diff| = {err:.2e}", flush=True)
    assert err < 5e-2, err


if __name__ == "__main__":
    main()
