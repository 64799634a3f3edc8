"""A/B the megakernel vs the per-segment scan engine on the real TPU.

Flagship config (bench.py contract): 512^2, stepsize 1/512, fV-SRN
32:32:32 SnakeAlt:2 + 14 fourier + 32^3 x 16ch latent grid, bucketed
(nb=6), bf16 table. Times forward (early-out) and fwd+bwd (loss+grads).

Usage: tools/tpurun.sh tools/bench_mega.py /tmp/bench_mega.log
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
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                            seg=32, tile=256, n_buckets=6,
                            grid_sizes=(32, 32, 32))
    rs = jnp.asarray(rs_np)
    rd = jnp.asarray(rd_np)
    net = vol.network

    def timed(fn, *args, reps=8):
        out = jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts), float(np.mean(ts)), out

    results = {}
    for engine in ("scan", "mega"):
        @jax.jit
        def fwd(net, tft):
            return fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
                seg=32, tile=256, enable_early_out=True,
                differentiable=False, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine=engine)

        @jax.jit
        def fwdbwd(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs, rd, n, bm, bs, t, plan=plan, stepsize=STEP,
                    seg=32, tile=256, enable_early_out=False,
                    differentiable=True, latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine=engine)
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        t0 = time.perf_counter()
        tmin_f, tmean_f, out_f = timed(fwd, net, tf.tensor)
        print(f"[{engine}] fwd compile+4: {time.perf_counter()-t0:.1f}s "
              f"min {tmin_f:.3f}s mean {tmean_f:.3f}s "
              f"({W*H/tmean_f/1e6:.3f} Mrays/s)", flush=True)
        t0 = time.perf_counter()
        tmin_b, tmean_b, out_b = timed(fwdbwd, net, tf.tensor)
        print(f"[{engine}] fwd+bwd compile+4: {time.perf_counter()-t0:.1f}s "
              f"min {tmin_b:.3f}s mean {tmean_b:.3f}s "
              f"({W*H/tmean_b/1e6:.3f} Mrays/s)", flush=True)
        results[engine] = (out_f, out_b)

    # numeric gate: mega == scan on the compiled TPU path
    a = np.asarray(results["scan"][0])
    b = np.asarray(results["mega"][0])
    print("fwd |mega-scan| max:", np.abs(a - b).max())
    la, ga = results["scan"][1]
    lb, gb = results["mega"][1]
    print("loss scan %.6f mega %.6f" % (float(la), float(lb)))
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        err = np.abs(np.asarray(pa, np.float32)
                     - np.asarray(pb, np.float32)).max()
        if err > 2e-2:
            print("GRAD MISMATCH", pa.shape, err)
    print("DONE")


if __name__ == "__main__":
    main()
