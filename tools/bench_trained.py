"""Trained-scene flagship bench: fwd+bwd through the megakernel at
512^2, stepsize 1/512, on the TRAINED checkpoint (the scene class the
reference's harness times, eval_VolumetricFeatures.py:147-200) --
A/B over saturation clamp, in-kernel early-out, and tile width.

Usage: tools/tpurun.sh tools/bench_trained.py /tmp/bench_trained.log
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
    from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,
                                  generate_rays)
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
    rs_all = np.asarray(s).reshape(-1, 3)
    rd_all = np.asarray(d).reshape(-1, 3)

    def bench(tag, *, tile, bw, bh, clip_on, early_out, n_buckets=3,
              frames=FRAMES):
        perm, _inv = block_ray_permutation(W, H, bw, bh)
        rs_np, rd_np = rs_all[perm], rd_all[perm]
        clip = None
        if clip_on:
            clip = probe_saturation_tmax(
                rs_np, rd_np, nvol, tf, stepsize=STEP, max_steps=steps,
                coarse=8, margin_steps=16)
        plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                                seg=32, tile=tile, n_buckets=n_buckets,
                                grid_sizes=(32, 32, 32), tmax_clip=clip)
        rs, rd = jnp.asarray(rs_np), jnp.asarray(rd_np)

        @jax.jit
        def fb(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs, rd, n, bm, bs, t, plan=plan, stepsize=STEP,
                    seg=32, tile=tile, enable_early_out=early_out,
                    differentiable=True, latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine="mega")
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        loss, _ = fb(net, tf.tensor)
        _ = float(loss)
        t0 = time.perf_counter()
        outs = [fb(net, tf.tensor)[0] for _ in range(frames)]
        _ = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / frames
        segsum = sum(sz // tile * -(-st // 32) for sz, st in
                     zip(plan.group_sizes, plan.group_steps))
        print(f"{tag}: {dt:.3f}s/frame {W*H/dt/1e6:.3f} Mrays/s "
              f"(grid slots {segsum}, steps {plan.group_steps})",
              flush=True)
        return dt

    bench("t256 noclip eoF", tile=256, bw=16, bh=16, clip_on=False,
          early_out=False)
    bench("t256 noclip eoT", tile=256, bw=16, bh=16, clip_on=False,
          early_out=True)
    bench("t256 clip   eoT", tile=256, bw=16, bh=16, clip_on=True,
          early_out=True)
    bench("t128 clip   eoT", tile=128, bw=16, bh=8, clip_on=True,
          early_out=True)
    bench("t64  clip   eoT", tile=64, bw=8, bh=8, clip_on=True,
          early_out=True)
    bench("t256 clip   eoT b6", tile=256, bw=16, bh=16, clip_on=True,
          early_out=True, n_buckets=6)
    bench("t64  clip   eoT b6", tile=64, bw=8, bh=8, clip_on=True,
          early_out=True, n_buckets=6)
    print("DONE")


if __name__ == "__main__":
    main()
