"""(seg, tile, nb) shape sweep for the megakernel after the dense-bwd +
minimax-trig round. Smaller tiles shrink the certified boxfeat footprint
(fewer resolve FLOPs) at the cost of more per-program overhead.

Usage: tools/tpurun.sh tools/sweep_mega_shape.py /tmp/sweep_shape.log
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
    from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,
                                  generate_rays)
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets)

    W = H = 512
    STEP = 1.0 / 512
    vol, tf, cfg = _build_flagship()
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, W, H, fov_y_radians=0.7853981633974483)
    rs0 = np.asarray(s).reshape(-1, 3)
    rd0 = np.asarray(d).reshape(-1, 3)
    bm = np.asarray(vol.box_min)
    bs = np.asarray(vol.box_size)
    net = vol.network

    # (seg, tile, nb, block_w, block_h)
    cases = [
        (32, 256, 3, 16, 16),
        (32, 128, 3, 16, 8),
        (32, 128, 6, 16, 8),
        (16, 128, 3, 16, 8),
        (32, 64, 3, 8, 8),
        (64, 128, 3, 16, 8),
        (32, 512, 3, 32, 16),
        (16, 256, 3, 16, 16),
    ]
    for seg, tile, nb, bw, bh in cases:
        perm, _ = block_ray_permutation(W, H, bw, bh)
        rs_np, rd_np = rs0[perm], rd0[perm]
        try:
            plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                                    seg=seg, tile=tile, n_buckets=nb,
                                    grid_sizes=(32, 32, 32))
        except Exception as e:
            print(f"seg{seg} tile{tile} nb{nb}: plan FAIL {e}",
                  flush=True)
            continue
        rs = jnp.asarray(rs_np)
        rd = jnp.asarray(rd_np)

        @jax.jit
        def fb(net, tft, rs=rs, rd=rd, plan=plan, seg=seg, tile=tile):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs, rd, n, bm, bs, t, plan=plan, stepsize=STEP,
                    seg=seg, tile=tile, enable_early_out=False,
                    differentiable=True, latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine="mega")
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        try:
            _ = float(fb(net, tf.tensor)[0])
        except Exception as e:
            print(f"seg{seg} tile{tile} nb{nb}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        ts = []
        for _i in range(5):
            t0 = time.perf_counter()
            r = fb(net, tf.tensor)
            _ = float(r[0])
            ts.append(time.perf_counter() - t0)
        print(f"seg{seg} tile{tile} nb{nb}: min {min(ts):.3f}s mean "
              f"{np.mean(ts):.3f}s ({W*H/min(ts)/1e6:.3f} Mrays/s)",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
