"""Megakernel BACKWARD ablation: where do the 240 ms go?

Per-frame device time (profile_mega xplane, nb=3 flagship): bwd kernels
240 ms, fwd(jvp) kernels 120 ms, XLA glue ~8 ms. FLOP accounting says
the bwd is dominated by f32 matmuls: the latent-transpose dtab
accumulation (nxb x (WROWS, N)x(N, 128)) and the ga mega-contraction
((152, N)x(136, N)). Variants:

  full-f32     -- as shipped (compute_dtype=f32)
  full-bf16    -- compute_dtype=bf16: MLP matmuls + bwd contractions +
                  boxfeat resolve + latent transpose all bf16 (new)
  nolatgrad    -- latent transpose + dtab RMW gutted (timing only)
  noresolve    -- bwd resolve replay gutted (lat = zeros)
  nocore       -- bwd_segment_core replaced by passthrough
  emptybwd     -- bwd kernel body near-empty at identical grid/specs

Usage: tools/tpurun.sh tools/ablate_mega_bwd.py /tmp/ablate_mega_bwd.log
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
    from fvsrn_tpu.ops import fused_dvr, fused_dvr_bwd, fused_mega
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

    def bench(tag, compute_dtype=jnp.float32, fwd_only=False):
        @jax.jit
        def fb(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs, rd, n, bm, bs, t, plan=plan, stepsize=STEP,
                    seg=32, tile=256, enable_early_out=False,
                    differentiable=True, latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine="mega",
                    compute_dtype=compute_dtype)
                return jnp.mean(c ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

        @jax.jit
        def fwd(net, tft):
            return fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
                seg=32, tile=256, enable_early_out=True,
                differentiable=False, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine="mega",
                compute_dtype=compute_dtype)

        fn = fwd if fwd_only else fb
        jax.block_until_ready(fn(net, tf.tensor))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = fn(net, tf.tensor)
            _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: min {min(ts):.3f}s mean {np.mean(ts):.3f}s "
              f"({W*H/min(ts)/1e6:.3f} Mrays/s at min)", flush=True)

    bench("full-f32 fwdbwd")
    bench("full-bf16 fwdbwd", compute_dtype=jnp.bfloat16)
    bench("full-bf16 fwd", compute_dtype=jnp.bfloat16, fwd_only=True)

    # --- nolatgrad: gut the latent transpose + dtab RMW ---
    import jax.experimental.pallas as pl  # noqa: F401
    src_bwd = fused_mega._mega_bwd_kernel
    real_emit = fused_dvr_bwd.bwd_segment_core

    # monkeypatch strategy: replace pieces inside fused_mega's kernel by
    # patching the helpers it calls.
    real_bfp = fused_dvr._boxfeat_features_parts

    def fake_bfp(x, parts, by, bz, xb0, *, spec_t, grid_sizes,
                 compute_dtype=jnp.float32):
        n = x.shape[1]
        feat = jnp.zeros((16, n), jnp.float32) + x[0:1, :] * 1e-3
        szxc, szyc, szzc, nxb, szycp = spec_t
        aux = fused_dvr.BoxfeatAux(
            tuple(jnp.zeros((szycp, 128), jnp.float32)
                  for _ in range(nxb)),
            tuple(jnp.zeros((128, n), jnp.float32) for _ in range(nxb)),
            jnp.zeros((szycp, n), jnp.float32),
            jnp.zeros((nxb * 8, n), jnp.float32),
            x[0:1] * 0, x[0:1] * 0, x[1:2] * 0, x[1:2] * 0,
            x[2:3] * 0, x[2:3] * 0)
        return feat, aux

    def fake_core(**kw):
        tile = kw["tile"]
        lat = kw["lat"]
        n = kw["x"].shape[1]
        d_lat = (jnp.zeros((16, n), jnp.float32)
                 if lat is not None else None)
        dcarry_rows = kw["dcarry"] * 0.5
        return d_lat, dcarry_rows

    fused_mega._boxfeat_features_parts = fake_bfp
    try:
        bench("noresolve-bwd+fwd? (both gutted) fwdbwd")
    finally:
        fused_mega._boxfeat_features_parts = real_bfp

    fused_mega.bwd_segment_core = fake_core
    try:
        bench("nocore fwdbwd")
    finally:
        fused_mega.bwd_segment_core = real_emit
    print("DONE")


if __name__ == "__main__":
    main()
