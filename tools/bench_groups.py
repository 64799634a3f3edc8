"""A/B of the megakernel's group-windowed boxfeat resolve
(resolve_groups): trained-scene shipping config (512^2, saturation clip,
gated early-out adjoint), fwd+bwd frames.

Usage: python tools/bench_groups.py [groups...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

W = H = 512
STEP = 1.0 / 512
FRAMES = 8


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
    perm, _inv = block_ray_permutation(W, H, 16, 16)
    rs_np = np.asarray(s).reshape(-1, 3)[perm]
    rd_np = np.asarray(d).reshape(-1, 3)[perm]
    clip = probe_saturation_tmax(rs_np, rd_np, nvol, tf, stepsize=STEP,
                                 max_steps=steps, coarse=8,
                                 margin_steps=16)
    rs, rd = jnp.asarray(rs_np), jnp.asarray(rd_np)

    for groups in [int(a) for a in (sys.argv[1:] or ["1", "2", "4"])]:
        plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                                seg=32, tile=256, n_buckets=3,
                                grid_sizes=(32, 32, 32), tmax_clip=clip,
                                resolve_groups=groups)
        if groups > 1:
            for sp, spf in zip(plan.group_specs, plan.group_specs_fine):
                print(f"  coarse {sp} fine {spf}", flush=True)
        kw = dict(plan=plan, stepsize=STEP, seg=32, tile=256,
                  enable_early_out=True, differentiable=True,
                  latent_mode="boxfeat", table_dtype=jnp.bfloat16,
                  engine="mega")
        if groups > 1:
            kw["resolve_groups"] = groups

        @jax.jit
        def fn(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(rs, rd, n, bm, bs, t, **kw)
                return jnp.mean(c ** 2)
            loss, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                net, tft)
            return loss + sum(jnp.sum(l) for l in jax.tree.leaves(g))

        t0 = time.perf_counter()
        _ = float(fn(net, tf.tensor))
        dt0 = time.perf_counter() - t0
        print(f"groups={groups}: compile+first {dt0:.1f}s", flush=True)
        t0 = time.perf_counter()
        outs = [fn(net, tf.tensor) for _ in range(FRAMES)]
        _ = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"groups={groups}: {dt*1000:.1f} ms/frame "
              f"({W*H/dt/1e6:.3f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
