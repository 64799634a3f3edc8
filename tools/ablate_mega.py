"""Megakernel ablations on the real TPU: where does the time go?

Variants (forward, early-out, flagship 512^2 nb=6):
  full        -- as shipped
  bf16        -- compute_dtype=bf16 matmuls
  seg/tile    -- program shape sweep
  notrig      -- _fast_sincos replaced by a 2-op fake (bounds VPU trig)
  nolatent    -- latent resolve skipped (bounds slab slice + resolve)
  notf        -- TF+blend epilogue replaced by a row sum (bounds epilogue)

Usage: tools/tpurun.sh tools/ablate_mega.py /tmp/ablate_mega.log
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
    from fvsrn_tpu.ops import fused_dvr, fused_mega
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

    def bench(tag, seg=32, tile=256, cd=jnp.float32, nb=6):
        plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                                seg=seg, tile=tile, n_buckets=nb,
                                grid_sizes=(32, 32, 32))

        @jax.jit
        def fwd(net, tft):
            return fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
                seg=seg, tile=tile, enable_early_out=True,
                differentiable=False, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, compute_dtype=cd,
                engine="mega")

        jax.block_until_ready(fwd(net, tf.tensor))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(net, tf.tensor))
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: min {min(ts):.3f}s mean {np.mean(ts):.3f}s "
              f"({W*H/np.mean(ts)/1e6:.3f} Mrays/s)", flush=True)

    bench("full seg32 tile256")
    bench("bf16 seg32 tile256", cd=jnp.bfloat16)
    bench("seg16 tile256", seg=16)
    bench("seg32 tile128", tile=128)
    bench("seg32 tile512", tile=512)
    bench("seg64 tile256", seg=64)
    bench("nb12 seg32 tile256", nb=12)

    # --- monkeypatched ablations ---
    real_sincos = fused_dvr._fast_sincos

    def fake_sincos(x):
        return x * 0.01, 1.0 - x * 0.01

    fused_dvr._fast_sincos = fake_sincos
    try:
        import importlib
        # _mlp_forward_T references module-global _fast_sincos directly
        bench("notrig seg32 tile256")
    finally:
        fused_dvr._fast_sincos = real_sincos

    real_parts = fused_dvr._boxfeat_features_parts

    def fake_parts(x, parts, base_y, base_z, xb0, *, spec_t, grid_sizes):
        feat = jnp.zeros((16, x.shape[1]), jnp.float32) + parts[0][0, 0]
        return feat, None

    fused_dvr._boxfeat_features_parts = fake_parts
    fused_mega._boxfeat_features_parts = fake_parts
    try:
        bench("noresolve seg32 tile256")
    finally:
        fused_dvr._boxfeat_features_parts = real_parts
        fused_mega._boxfeat_features_parts = real_parts

    real_tf = fused_dvr._piecewise_tf

    def fake_tf(v2, tf_ref, *, tf_points, density_min, density_max,
                stepsize):
        r = v2 * 0.1
        return [r, r, r, r], r * stepsize, v2

    fused_dvr._piecewise_tf = fake_tf
    fused_mega._piecewise_tf = fake_tf
    try:
        bench("notf seg32 tile256")
    finally:
        fused_dvr._piecewise_tf = real_tf
        fused_mega._piecewise_tf = real_tf
    print("DONE")


if __name__ == "__main__":
    main()
