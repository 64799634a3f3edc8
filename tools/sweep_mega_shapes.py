"""Trained-scene (seg, tile) shape sweep of the megakernel fwd / fwd+bwd.

Round-4 motivation: the corrected cost map (PERF.md) puts the boxfeat
resolve (40 ms), xfold (32 ms) and dtab (25 ms) -- all scaling with the
per-(tile, segment) certified footprint -- at ~40% of the fwd+bwd
frame. Smaller ray tiles shrink the footprint's spatial spread (8x8
pixel blocks cover ~half the latent window of 16x16 blocks), trading
against per-program overheads and matmul N-efficiency. The round-2
sweep that chose (32, 256) predates the footprint-dominated regime, so
re-measure at HEAD on the shipping bench config.

Usage: tools/tpurun.sh tools/sweep_mega_shapes.py /tmp/sweep_shapes.log
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

W = H = 512
STEP = 1.0 / 512
FRAMES = 6


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import fvsrn_tpu as fv
    from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets,
                                         probe_saturation_tmax)
    from fvsrn_tpu.raytracer.dvr import max_steps_bound

    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 10.0, 30.0], positions=[0.0, 0.5, 1.0])
    model = LoadedModel.from_checkpoint(
        "/root/repo/assets/flagship_mlobb.hdf5", tf=tf)
    net = model.network
    nvol = VolumeInterpolationNetwork.make(net)
    bm = np.asarray((-0.5, -0.5, -0.5), np.float32)
    bs = np.asarray((1.0, 1.0, 1.0), np.float32)
    steps = max_steps_bound((1.0, 1.0, 1.0), STEP)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, W, H, fov_y_radians=0.7853981633974483)

    def run(seg, tile, blk, bwd):
        perm, _inv = block_ray_permutation(W, H, blk[0], blk[1])
        rs_np = np.asarray(s).reshape(-1, 3)[perm]
        rd_np = np.asarray(d).reshape(-1, 3)[perm]
        clip = probe_saturation_tmax(rs_np, rd_np, nvol, tf, stepsize=STEP,
                                     max_steps=steps, coarse=8,
                                     margin_steps=16)
        plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                                seg=seg, tile=tile, n_buckets=3,
                                grid_sizes=(32, 32, 32), tmax_clip=clip)
        rs, rd = jnp.asarray(rs_np), jnp.asarray(rd_np)
        if bwd:
            @jax.jit
            def fn(net, tft):
                def loss_fn(n, t):
                    c = fused_trace_dvr_bucketed(
                        rs, rd, n, bm, bs, t, plan=plan,
                        stepsize=STEP, seg=seg, tile=tile,
                        enable_early_out=True, differentiable=True,
                        latent_mode="boxfeat",
                        table_dtype=jnp.bfloat16, engine="mega")
                    return jnp.mean(c ** 2)
                loss, g = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(net, tft)
                return loss + sum(jnp.sum(l) for l in jax.tree.leaves(g))
        else:
            @jax.jit
            def fn(net, tft):
                c = fused_trace_dvr_bucketed(
                    rs, rd, net, bm, bs, tft, plan=plan,
                    stepsize=STEP, seg=seg, tile=tile,
                    enable_early_out=True, differentiable=False,
                    latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine="mega")
                return jnp.mean(c ** 2)
        _ = float(fn(net, tf.tensor))
        t0 = time.perf_counter()
        outs = [fn(net, tf.tensor) for _ in range(FRAMES)]
        _ = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / FRAMES
        kind = "fwd+bwd" if bwd else "fwd"
        print(f"[{kind}] seg={seg} tile={tile} blk={blk[0]}x{blk[1]}: "
              f"{dt*1000:.1f} ms/frame", flush=True)

    shapes = [(32, 256, (16, 16)), (32, 128, (16, 8)), (16, 256, (16, 16)),
              (32, 64, (8, 8)), (16, 128, (16, 8)), (64, 128, (16, 8))]
    for bwd in (False, True):
        for seg, tile, blk in shapes:
            try:
                run(seg, tile, blk, bwd)
            except Exception as e:
                print(f"seg={seg} tile={tile} bwd={bwd} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
