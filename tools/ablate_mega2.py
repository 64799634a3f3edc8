"""Megakernel deep ablation: split the ~110 ms the first ablation left
unexplained (matmuls vs sample-build vs compose vs per-program overhead).

All variants keep shapes/layouts identical and only gut one stage:
  full       -- as shipped (nb=3 to match bench.py)
  nomlp      -- MLP replaced by a row-sum of the input (bounds matmuls
                + activations, keeps trig alive via one fourier row)
  nosamples  -- positions faked from broadcast iota (bounds the
                per-(seg,tile) concat build)
  nocompose  -- segment compose tree replaced by a mean (bounds the
                log-depth blend epilogue)
  empty      -- kernel body only writes zeros on s==0 (bounds grid +
                pipeline + launch overhead at the same grid/specs)

Usage: tools/tpurun.sh tools/ablate_mega2.py /tmp/ablate_mega2.log
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
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                            seg=32, tile=256, n_buckets=3,
                            grid_sizes=(32, 32, 32))

    def bench(tag, fwdbwd=False):
        @jax.jit
        def fwd(net, tft):
            return fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
                seg=32, tile=256, enable_early_out=not fwdbwd,
                differentiable=False, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine="mega")

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

        fn = fb if fwdbwd else fwd
        jax.block_until_ready(fn(net, tf.tensor))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = fn(net, tf.tensor)
            _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: min {min(ts):.3f}s mean {np.mean(ts):.3f}s "
              f"({W*H/min(ts)/1e6:.3f} Mrays/s at min)", flush=True)

    bench("full fwd")
    bench("full fwdbwd", fwdbwd=True)

    # --- nomlp: gut every matmul+activation, keep trig on one row ---
    real_mlp = fused_dvr._mlp_forward_T

    def fake_mlp(x, dirs, lat, fourier, fdir, w1pos, w1dir, w1cos, w1sin,
                 w1lat, b1, hw, hb, w_out, b_out, *, activation,
                 act_param, output_mode, compute_dtype,
                 want_pack=False, want_stash=False):
        v = jnp.sum(x, axis=0, keepdims=True) * 0.3
        if lat is not None:
            v = v + jnp.sum(lat[0:1, :], axis=0, keepdims=True) * 0.01
        v = jnp.clip(v, 0.0, 1.0)
        return v, None, None

    fused_dvr._mlp_forward_T = fake_mlp
    fused_mega._mlp_forward_T = fake_mlp
    try:
        bench("nomlp fwd")
    finally:
        fused_dvr._mlp_forward_T = real_mlp
        fused_mega._mlp_forward_T = real_mlp

    # --- nosamples: fake the per-program sample build ---
    real_bs = fused_mega._build_samples

    def fake_bs(rays, k0, sf, *, seg, tile, stepsize, box_min, box_size,
                has_direction):
        n = seg * tile
        io = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(
            jnp.float32)
        kk = io * 0.0 + k0 + sf * seg
        tval = kk * stepsize
        x = jnp.concatenate([io * 1e-5, io * 2e-5, io * 3e-5], axis=0)
        dirs = None
        return kk, tval, x, dirs

    fused_mega._build_samples = fake_bs
    try:
        bench("nosamples fwd")
    finally:
        fused_mega._build_samples = real_bs

    # --- nocompose: replace the segment compose tree with a mean ---
    real_ct = fused_dvr._compose_tree

    def fake_ct(rgba, absorption, require, seg, *, blend_beer,
                normals=None, tval2=None):
        m = jnp.where(require, absorption, 0.0)
        sc = [jnp.mean(rgba[c] * m, axis=0, keepdims=True)
              for c in range(3)]
        return sc, jnp.mean(m, axis=0, keepdims=True)

    fused_dvr._compose_tree = fake_ct
    fused_mega._compose_tree = fake_ct
    try:
        bench("nocompose fwd")
    finally:
        fused_dvr._compose_tree = real_ct
        fused_mega._compose_tree = real_ct

    # --- empty: same grid/specs, body writes only at s == 0 ---
    from jax.experimental import pallas as pl

    real_body = fused_mega._mega_fwd_kernel

    def empty_kernel(k0t_ref, bases_ref, rays_ref, *refs, tile, **statics):
        out_ref = refs[-1] if not statics.get("differentiable") else \
            refs[-2]
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _init():
            out_ref[:] = jnp.zeros((8, tile), jnp.float32) \
                + rays_ref[0, 0] + k0t_ref[0, 0, 0] \
                + bases_ref[0, 0, 3].astype(jnp.float32)

    fused_mega._mega_fwd_kernel = empty_kernel
    try:
        bench("empty fwd")
    finally:
        fused_mega._mega_fwd_kernel = real_body
    print("DONE")


if __name__ == "__main__":
    main()
