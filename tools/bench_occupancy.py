"""TF-aware empty-space skipping on the trained flagship (real TPU).

The bench TF (a ramp from zero) leaves nothing skippable -- measured in
round 4: ZERO macrocells under every threshold, because the SRN's
sigmoid-free density floor never hits exact zero opacity. Real
transfer functions for sparse scenes (the reference's Ejecta figures)
carry a zero band below an interest threshold; this tool measures the
culling economics on such a TF: occupancy build -> per-(tile, segment)
masks -> megakernel forward with/without segment_active.

Usage: tools/tpurun.sh tools/bench_occupancy.py /tmp/bench_occ.log
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = H = 512
STEP = 1.0 / 512
FRAMES = 6


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import fvsrn_tpu as fv
    from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets,
                                         probe_saturation_tmax)
    from fvsrn_tpu.ops.occupancy import (build_occupancy,
                                         plan_segment_occupancy)
    from fvsrn_tpu.raytracer.dvr import max_steps_bound

    # a sparse-scene TF: zero band below 0.45 (the Ejecta regime)
    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.2, 0.2, 0.9], [0.9, 0.4, 0.1],
             [1.0, 1.0, 0.6]],
        opacity=[0.0, 0.0, 15.0, 30.0],
        positions=[0.0, 0.45, 0.7, 1.0])
    model = LoadedModel.from_checkpoint(
        os.path.join(ROOT, "assets", "flagship_mlobb.hdf5"), tf=tf)
    net = model.network
    nvol = VolumeInterpolationNetwork.make(net)
    bm = np.asarray((-0.5, -0.5, -0.5), np.float32)
    bs = np.asarray((1.0, 1.0, 1.0), np.float32)
    steps = max_steps_bound((1.0, 1.0, 1.0), STEP)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, W, H, fov_y_radians=0.7853981633974483)
    perm, _inv = block_ray_permutation(W, H, 16, 16)
    rs_np = np.asarray(s).reshape(-1, 3)[perm]
    rd_np = np.asarray(d).reshape(-1, 3)[perm]
    seg, tile = 32, 256

    t0 = time.time()
    occ = build_occupancy(nvol, tf, resolution=32, fine=4,
                          stepsize=STEP, alpha_skip=1e-5)
    print(f"occupancy built: {occ.mean()*100:.1f}% occupied "
          f"({time.time()-t0:.1f}s)", flush=True)

    clip = probe_saturation_tmax(rs_np, rd_np, nvol, tf, stepsize=STEP,
                                 max_steps=steps, coarse=8,
                                 margin_steps=16)
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                            seg=seg, tile=tile, n_buckets=3,
                            grid_sizes=(32, 32, 32), tmax_clip=clip)
    t0 = time.time()
    # the plan's perm applies to the block-permuted rays rs_np/rd_np
    # (its "input order" is whatever plan_ray_buckets saw)
    sa_groups = plan_segment_occupancy(plan, rs_np, rd_np, occ, bm, bs,
                                       stepsize=STEP, seg=seg, tile=tile)
    culled = 1.0 - float(np.mean([m.mean() for m in sa_groups]))
    print(f"segment masks: {culled*100:.1f}% of (tile,seg) programs "
          f"culled ({time.time()-t0:.1f}s)", flush=True)

    rs, rd = jnp.asarray(rs_np), jnp.asarray(rd_np)

    def make_fn(sa):
        @jax.jit
        def fn(net, tft):
            c = fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
                seg=seg, tile=tile, enable_early_out=True,
                differentiable=False, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine="mega",
                segment_active_groups=sa)
            return c
        return fn

    def bench(tag, fn):
        red = jax.jit(lambda x: jnp.mean(x))
        out = fn(net, tf.tensor)
        _ = float(red(out))
        t0 = time.perf_counter()
        outs = [fn(net, tf.tensor) for _ in range(FRAMES)]
        _ = float(red(outs[-1]))
        for o in outs[:-1]:
            _ = float(red(o))
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"{tag}: {dt*1000:.1f} ms/frame "
              f"({W*H/dt/1e6:.2f} Mrays/s)", flush=True)
        return np.asarray(out), dt

    img_base, dt_b = bench("no occupancy", make_fn(None))
    img_occ, dt_o = bench("with occupancy", make_fn(sa_groups))
    diff = float(np.abs(img_occ - img_base).max())
    print(f"img max|diff| {diff:.2e} (bound ~{steps*1e-5:.2e}); "
          f"speedup {dt_b/dt_o:.2f}x", flush=True)


if __name__ == "__main__":
    main()
