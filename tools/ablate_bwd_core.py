"""Split bwd_segment_core's cost: trig vs weight-grad contractions vs
the rest. Monkeypatches the helpers fused_dvr_bwd binds by name.

Usage: tools/tpurun.sh tools/ablate_bwd_core.py /tmp/ablate_bwd_core.log
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
    from fvsrn_tpu.ops import fused_dvr_bwd
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

    def bench(tag):
        @jax.jit
        def fb(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs, rd, n, bm, bs, t, plan=plan, stepsize=STEP,
                    seg=32, tile=256, enable_early_out=False,
                    differentiable=True, latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine="mega")
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        jax.block_until_ready(fb(net, tf.tensor))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = fb(net, tf.tensor)
            _ = float(r[0])
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: min {min(ts):.3f}s mean {np.mean(ts):.3f}s "
              f"({W*H/min(ts)/1e6:.3f} Mrays/s at min)", flush=True)

    bench("full fwdbwd")

    for name in ("blendadj", "tfadj", "wgrad"):
        fused_dvr_bwd._ABLATE = frozenset({name})
        try:
            bench(f"no-{name} fwdbwd")
        finally:
            fused_dvr_bwd._ABLATE = frozenset()

    # --- notrig: gut trig in the BWD module only ---
    real_sc = fused_dvr_bwd._fast_sincos
    real_avd = fused_dvr_bwd._act_value_deriv

    def fake_sincos(x):
        return x * 0.5, 1.0 - x * 0.25

    def fake_avd(name, x, p):
        return jnp.maximum(x, 0.0) + 0.1 * x, jnp.clip(x, 0.1, 1.0)

    fused_dvr_bwd._fast_sincos = fake_sincos
    fused_dvr_bwd._act_value_deriv = fake_avd
    try:
        bench("notrig-bwd fwdbwd")
    finally:
        fused_dvr_bwd._fast_sincos = real_sc
        fused_dvr_bwd._act_value_deriv = real_avd

    # --- noct: weight-gradient contractions return zeros ---
    import fvsrn_tpu.ops.fused_dvr_bwd as fb_mod
    src_core = fb_mod.bwd_segment_core

    import functools

    def make_noct_core():
        # patch jax.lax.dot_general ONLY inside bwd core via a wrapper
        # on mm_ct is not reachable; instead patch at the module level:
        # easiest -- re-enter the real core with a shim that intercepts
        # lax.dot_general calls contracting the sample axis. Overkill;
        # approximate by killing d_y (zero cotangent into the MLP
        # adjoint -- contractions still execute). Not used.
        pass

    print("DONE")


if __name__ == "__main__":
    main()
