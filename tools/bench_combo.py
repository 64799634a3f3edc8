"""Candidate bench-contract sweep: early-out x compute dtype on the
flagship fwd+bwd (the bench.py configuration), plus a bf16-vs-f32
gradient error check. Decides whether bench.py can flip
enable_early_out=True (exact gated adjoint) and compute_dtype=bf16
(the analog of the reference's TENSORCORES_MIXED fp16 matmuls,
renderer_volume_tensorcores.cuh) without breaking the numeric contract.

Usage: python tools/bench_combo.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    rs_np = np.asarray(s).reshape(-1, 3)
    rd_np = np.asarray(d).reshape(-1, 3)
    perm, _ = block_ray_permutation(W, H, 16, 16)
    rs_np, rd_np = rs_np[perm], rd_np[perm]
    bm = np.asarray(vol.box_min)
    bs = np.asarray(vol.box_size)
    rs = jnp.asarray(rs_np)
    rd = jnp.asarray(rd_np)
    net = vol.network
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                            seg=32, tile=256, n_buckets=3,
                            grid_sizes=(32, 32, 32))

    grads = {}

    def bench(tag, *, early_out, compute_dtype, frames=16):
        # 16 frames: tunnel run-to-run variance at 4 frames (~2%)
        # exceeded the per-variant spreads PERF.md reads off this sweep
        @jax.jit
        def fb(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs, rd, n, bm, bs, t, plan=plan, stepsize=STEP,
                    seg=32, tile=256, enable_early_out=early_out,
                    differentiable=True, latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine="mega",
                    compute_dtype=compute_dtype)
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        loss, g = fb(net, tf.tensor)
        _ = float(loss)  # warm-up sync
        t0 = time.perf_counter()
        outs = [fb(net, tf.tensor)[0] for _ in range(frames)]
        _ = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / frames
        print(f"{tag}: {dt:.3f}s/frame {W*H/dt/1e6:.3f} Mrays/s",
              flush=True)
        grads[tag] = g
        return dt

    bench("eoF-f32", early_out=False, compute_dtype=jnp.float32)
    bench("eoT-f32", early_out=True, compute_dtype=jnp.float32)
    bench("eoT-bf16", early_out=True, compute_dtype=jnp.bfloat16)
    bench("eoF-bf16", early_out=False, compute_dtype=jnp.bfloat16)

    # gradient error, bf16 vs f32, same (gated) function
    for pair in (("eoT-bf16", "eoT-f32"), ("eoF-bf16", "eoF-f32")):
        la = jax.tree.leaves(grads[pair[0]])
        lb = jax.tree.leaves(grads[pair[1]])
        worst = 0.0
        for x, y in zip(la, lb):
            x, y = np.asarray(x, np.float32), np.asarray(y, np.float32)
            scale = max(1e-3, float(np.abs(y).max()))
            worst = max(worst, float(np.abs(x - y).max()) / scale)
        print(f"grad rel err {pair[0]} vs {pair[1]}: {worst:.3e}",
              flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
