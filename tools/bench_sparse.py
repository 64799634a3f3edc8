"""Sparse-TF flagship measurement (round 5): where the early-out stack
finally compounds.

Scene: the trained MULTI_SHELL flagship (assets/flagship_shell.hdf5,
SSIM 0.9973 vs GT) + the zero-band TF of scenes.sparse_scene -- the
reference's Ejecta-class regime (zero-opacity band, config-files/*.json)
where its in-kernel early-outs pay per step
(renderer_ray_evaluation_stepping_dvr.cuh:84-154).

Arms (512^2, stepsize 1/512):
  fwd base            bucketed plan only
  fwd +clips          + saturation tmax clip + entry tmin clip
  fwd +clips+occ      + TF-occupancy (tile, segment) culling
  fwd+bwd +clips      differentiable megakernel at the same clips
  fwd+bwd +clips+occ  informational (culled segments drop their
                      parameter gradients -- render-path only)

Numeric gate: fused vs plain-lattice oracle at the SAME clips on a ray
subset (image + gradients), plus occ-vs-no-occ image equality.

EXPLORATORY tool: the contracted sparse arms (and their numeric
gates) live in bench.py -- keep protocol changes there.

Usage: tools/tpurun.sh tools/bench_sparse.py /tmp/bench_sparse.log
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = H = 512
STEP = 1.0 / 512
FRAMES = 6


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import fvsrn_tpu as fv
    from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,
                                  generate_rays)
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets,
                                         probe_entry_tmin,
                                         probe_saturation_tmax)
    from fvsrn_tpu.ops.occupancy import (build_occupancy,
                                         plan_segment_occupancy)
    from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                         max_steps_bound, trace_dvr)
    from fvsrn_tpu.scenes import sparse_scene

    volume, tf, ckpt = sparse_scene()
    model = LoadedModel.from_checkpoint(ckpt, tf=tf)
    net = jax.device_put(model.network)
    tft = jax.device_put(tf.tensor)
    nvol = VolumeInterpolationNetwork.make(model.network)
    bm = np.asarray((-0.5, -0.5, -0.5), np.float32)
    bs = np.asarray((1.0, 1.0, 1.0), np.float32)
    steps = max_steps_bound((1.0, 1.0, 1.0), STEP)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, W, H, fov_y_radians=0.7853981633974483)
    seg, tile, bwp, bhp = 32, 128, 16, 8
    perm, _inv = block_ray_permutation(W, H, bwp, bhp)
    rs_np = np.asarray(s).reshape(-1, 3)[perm]
    rd_np = np.asarray(d).reshape(-1, 3)[perm]
    rs, rd = jnp.asarray(rs_np), jnp.asarray(rd_np)

    t0 = time.time()
    clip = probe_saturation_tmax(rs_np, rd_np, nvol, tf, stepsize=STEP,
                                 max_steps=steps, coarse=8,
                                 margin_steps=16)
    ent = probe_entry_tmin(rs_np, rd_np, nvol, tf, stepsize=STEP,
                           max_steps=steps, coarse=8, margin_steps=24)
    print(f"probes done ({time.time()-t0:.1f}s)", flush=True)

    plan0 = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                             seg=seg, tile=tile, n_buckets=3,
                             grid_sizes=(32, 32, 32))
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                            seg=seg, tile=tile, n_buckets=3,
                            grid_sizes=(32, 32, 32), tmax_clip=clip,
                            tmin_clip=ent)
    print("plan0 group_steps", plan0.group_steps, "sizes",
          plan0.group_sizes, "dead", plan0.dead, flush=True)
    print("plan  group_steps", plan.group_steps, "sizes",
          plan.group_sizes, "dead", plan.dead, flush=True)

    occ = build_occupancy(nvol, tf, resolution=32, fine=4,
                          stepsize=STEP, alpha_skip=1e-5)
    print(f"occupancy: {float(occ.mean())*100:.1f}% occupied "
          f"({time.time()-t0:.1f}s)", flush=True)
    sa_groups = plan_segment_occupancy(plan, rs_np, rd_np, occ, bm, bs,
                                       stepsize=STEP, seg=seg, tile=tile)
    culled = 1.0 - float(np.mean([m.mean() for m in sa_groups]))
    print(f"occupancy masks: {culled*100:.1f}% of (tile,seg) programs "
          f"culled", flush=True)
    sa_dev = tuple(jnp.asarray(m) for m in sa_groups)

    def make_fwd(plan_, sa_):
        @jax.jit
        def fn(net, tft):
            return fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan_, stepsize=STEP,
                seg=seg, tile=tile, enable_early_out=True,
                differentiable=False, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine="mega",
                segment_active_groups=sa_)
        return fn

    def make_fb(plan_, sa_, rs_=rs, rd_=rd):
        @jax.jit
        def fb(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs_, rd_, n, bm, bs, t, plan=plan_, stepsize=STEP,
                    seg=seg, tile=tile, enable_early_out=True,
                    differentiable=True, latent_mode="boxfeat",
                    table_dtype=jnp.bfloat16, engine="mega",
                    segment_active_groups=sa_)
                return jnp.mean(c ** 2), c
            (loss, img), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(net, tft)
            return loss, img, grads
        return fb

    red = jax.jit(lambda x: jnp.mean(x))

    def bench_fwd(tag, fn):
        out = fn(net, tft)
        _ = float(red(out))
        t0 = time.perf_counter()
        outs = [fn(net, tft) for _ in range(FRAMES)]
        _ = [float(red(o)) for o in outs]
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"{tag}: {dt*1000:.1f} ms ({W*H/dt/1e6:.2f} Mrays/s)",
              flush=True)
        return np.asarray(out), dt

    def bench_fb(tag, fb):
        loss, img, _ = fb(net, tft)
        _ = float(loss)
        t0 = time.perf_counter()
        losses = [fb(net, tft)[0] for _ in range(FRAMES)]
        _ = [float(v) for v in losses]
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"{tag}: {dt*1000:.1f} ms ({W*H/dt/1e6:.2f} Mrays/s)",
              flush=True)
        return np.asarray(img), dt

    img_b, dt_b = bench_fwd("fwd base (bucketed only)",
                            make_fwd(plan0, None))
    img_c, dt_c = bench_fwd("fwd +clips", make_fwd(plan, None))
    img_o, dt_o = bench_fwd("fwd +clips+occ", make_fwd(plan, sa_dev))
    print(f"occ-vs-no-occ img max|diff| "
          f"{float(np.abs(img_o - img_c).max()):.2e}", flush=True)
    print(f"clips-vs-base img max|diff| "
          f"{float(np.abs(img_c - img_b).max()):.2e}", flush=True)

    _, dt_fb = bench_fb("fwd+bwd +clips", make_fb(plan, None))
    _, dt_fbo = bench_fb("fwd+bwd +clips+occ (info)", make_fb(plan, sa_dev))

    # ---- numeric gate: fused vs oracle at the same clips (subset) ----
    GATE = 16384
    gs = plan.dead + plan.group_sizes[0]
    rs_p = rs_np[plan.perm]
    rd_p = rd_np[plan.perm]
    clip_p = plan.tmax_clip[gs:gs + GATE]
    ent_p = plan.tmin_clip[gs:gs + GATE]
    g_rs, g_rd = rs_p[gs:gs + GATE], rd_p[gs:gs + GATE]
    gplan = plan_ray_buckets(g_rs, g_rd, bm, bs, stepsize=STEP,
                             seg=seg, tile=tile, n_buckets=1,
                             grid_sizes=(32, 32, 32), tmax_clip=clip_p,
                             tmin_clip=ent_p)
    gfb = make_fb(gplan, None, jnp.asarray(g_rs), jnp.asarray(g_rd))
    _, gimg_f, ggrads_f = gfb(net, tft)
    cfg = RayEvaluationSteppingDvr.make(stepsize=STEP,
                                       enable_early_out=False)
    gsteps = int(max(gplan.group_steps))

    @jax.jit
    def plain_fb(net, tft):
        def loss_fn(n, t):
            v = VolumeInterpolationNetwork.make(n)
            out = trace_dvr(jnp.asarray(g_rs), jnp.asarray(g_rd), v,
                            fv.TransferFunctionPiecewiseLinear(tensor=t),
                            cfg, gsteps, checkpoint_chunk=1,
                            lattice=True,
                            tmax_in=jnp.asarray(clip_p)[:, None],
                            tmin_in=jnp.asarray(ent_p)[:, None])
            return jnp.mean(out.color ** 2), out.color
        (_, img), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(net, tft)
        return img, grads

    gimg_p, ggrads_p = plain_fb(net, tft)
    img_diff = float(np.abs(np.asarray(gimg_f)
                            - np.asarray(gimg_p)).max())
    rels = []
    for a, b in zip(jax.tree.leaves(ggrads_f), jax.tree.leaves(ggrads_p)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        nb = np.linalg.norm(b)
        if nb > 1e-12:
            rels.append(np.linalg.norm(a - b) / nb)
    grad_rel = float(max(rels)) if rels else float("nan")
    print(f"gate: img max|diff| {img_diff:.2e}, grad rel {grad_rel:.2e}",
          flush=True)

    print(f"SUMMARY fwd base {dt_b*1000:.1f} | +clips {dt_c*1000:.1f} "
          f"| +occ {dt_o*1000:.1f} | fb +clips {dt_fb*1000:.1f} "
          f"| fb +occ {dt_fbo*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
