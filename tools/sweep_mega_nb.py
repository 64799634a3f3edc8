"""Bucket-count sweep for the megakernel (fwd and fwd+bwd, flagship).

The megakernel skips inactive (tile, segment) programs in-kernel, so
bucketing's dead-segment slicing matters less; fewer buckets = fewer
pallas calls + compiles. Usage: tools/tpurun.sh <this> <log>.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _build_flagship
    from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets)

    W = H = 512
    STEP = 1.0 / 512
    vol, tf, cfg = _build_flagship()
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, W, H, fov_y_radians=0.7853981633974483)
    rs_np = np.asarray(s).reshape(-1, 3)
    rd_np = np.asarray(d).reshape(-1, 3)
    perm, _ = block_ray_permutation(W, H, 16, 16)
    rs_np, rd_np = rs_np[perm], rd_np[perm]
    bm = np.asarray(vol.box_min)
    bs = np.asarray(vol.box_size)
    rs = jnp.asarray(rs_np)
    rd = jnp.asarray(rd_np)
    net = vol.network

    for nb in (1, 2, 3, 6, 12):
        plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                                seg=32, tile=256, n_buckets=nb,
                                grid_sizes=(32, 32, 32))

        @jax.jit
        def fwd(net, tft):
            return fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
                seg=32, tile=256, enable_early_out=True,
                differentiable=False, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine="mega")

        @jax.jit
        def fwdbwd(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs, rd, n, bm, bs, t, plan=plan, stepsize=STEP,
                    seg=32, tile=256, enable_early_out=False,
                    differentiable=True, latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine="mega")
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        for tag, fn in (("fwd", fwd), ("fwdbwd", fwdbwd)):
            jax.block_until_ready(fn(net, tf.tensor))
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(net, tf.tensor))
                ts.append(time.perf_counter() - t0)
            print(f"nb={nb} {tag}: min {min(ts):.3f}s mean "
                  f"{np.mean(ts):.3f}s ({W*H/np.mean(ts)/1e6:.3f} Mrays/s)",
                  flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
