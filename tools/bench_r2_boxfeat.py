"""Round-2 TPU measurement: boxfeat latent path (lattice sampling +
factorized raw-grid trilerp) vs the round-1 table path and the one-hot
sub-box path.

Flagship config (32:32:32 SnakeAlt:2, 14 fourier, 32^3 x 16ch latent
grid) at 512^2, stepsize 1/512 -- the reference timing config
(eval_VolumetricFeatures.py:147-156). Rays are block-permuted into
16x16 pixel tiles (the spatial-coherence precondition).

Run via: tools/tpurun.sh tools/bench_r2_boxfeat.py /tmp/bench_boxfeat.log
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
from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation, certify_boxfeat,
                                     fused_trace_dvr)
from fvsrn_tpu.raytracer.dvr import max_steps_bound

WIDTH = HEIGHT = 512
STEPSIZE = 1.0 / 512
SEG, TILE = 32, 256


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.tree_util.tree_map(np.asarray, out)   # materialize (tunnel-safe)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


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
    spec = certify_boxfeat(rs_b, rd_b, (32, 32, 32), bm, bs,
                           stepsize=STEPSIZE, max_steps=steps,
                           seg=SEG, tile=TILE)
    print(f"boxfeat spec: {spec} szycp={spec.szycp} "
          f"({time.time() - t0:.2f}s)", flush=True)

    def make_fns(mode, spec_arg):
        @jax.jit
        def fwd(net, tft, rs, rd):
            return fused_trace_dvr(
                rs, rd, net, bm, bs, tft, stepsize=STEPSIZE,
                max_steps=steps, seg=SEG, tile=TILE,
                enable_early_out=True, differentiable=False,
                latent_mode=mode, table_dtype=jnp.bfloat16,
                subbox=spec_arg)

        @jax.jit
        def fwdbwd(net, tft, rs, rd):
            def loss_fn(net, tft):
                c = fused_trace_dvr(
                    rs, rd, net, bm, bs, tft, stepsize=STEPSIZE,
                    max_steps=steps, seg=SEG, tile=TILE,
                    enable_early_out=False, differentiable=True,
                    latent_mode=mode, table_dtype=jnp.bfloat16,
                    subbox=spec_arg)
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        return fwd, fwdbwd

    net, tft = vol.network, tf.tensor
    results = {}
    for name, mode, sp, (prs, prd) in [
            ("boxfeat", "boxfeat", spec, (rs_b, rd_b)),
            ("table", "table", 0, (rs, rd))]:
        fwd, fwdbwd = make_fns(mode, sp)
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

    # numeric gate: compiled boxfeat vs compiled f32-table forward.
    # boxfeat samples the step lattice (sub-step phase shift per ray),
    # so compare against the f32 boxfeat render only for finiteness and
    # against the table render loosely (same scene, shifted sampling).
    fwd_bf, _ = make_fns("boxfeat", spec)
    a = np.asarray(fwd_bf(net, tft, rs_b, rd_b))[np.asarray(inv)]
    assert np.isfinite(a).all()
    fwd_tb, _ = make_fns("table", 0)
    b = np.asarray(fwd_tb(net, tft, rs, rd))
    err = float(np.max(np.abs(a - b)))
    frac = float(np.mean(np.abs(a - b) > 0.02))
    print(f"boxfeat-vs-table max|diff| = {err:.3e} "
          f"frac>|0.02| = {frac:.4f}", flush=True)
    assert frac < 0.02, (err, frac)


if __name__ == "__main__":
    main()
