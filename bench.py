#!/usr/bin/env python
"""Benchmark: SRN DVR forward+backward throughput on the real TPU.

North-star metric (BASELINE.json, the contracted primary): Mrays/s/chip
for the fused SRN DVR FORWARD+BACKWARD at 512^2, world stepsize 1/512
-- the timing configuration of the reference's harness (reference:
applications/volnet/eval_VolumetricFeatures.py:147-200: 512x512,
stepsize 1/512, GPUTimer, first frame discarded as warm-up). The
reference's own harness times forward-only interactive rendering (the
scale of the 13.1 number), so the matching forward-only rate is
measured in the same run and reported as the named field
"forward_mrays" (with its own vs_baseline field) -- but "value" stays
the contracted fwd+bwd training-step rate.

Scene: the TRAINED flagship checkpoint (assets/flagship_mlobb.hdf5,
world-fit MARSCHNER_LOBB, the recipe of tools/train_flagship.py) -- the
reference's harness times TRAINED networks, where alpha saturation
makes early-out pay; a random-weight network is structurally
adversarial to it. The random-weight arm is still measured and
reported as a secondary field ("random_weights_fwd_bwd_mrays").

Baseline value: the reference stores no numbers (BASELINE.md); we use
13.1 Mrays/s = 512^2 px / 20 ms, the RTX 2070 TENSORCORES_MIXED
*forward-only* frame time scale implied by the paper's interactive-rate
claims (arXiv:2112.01579). Comparing our forward+backward "value"
against their forward-only rate is conservative; "forward_vs_baseline"
is the like-for-like comparison.

Numeric gate (same-run, on-device; the role of the reference's
unittests/testSRN.cpp:405-411 |delta|<1e-2 on-device check): the fused
image and its gradients are compared against the plain-JAX lattice
oracle on a ray subset; breaches set "gate": "fail" in the JSON.

Measures the fused Pallas MEGAKERNEL path (whole march as one
pallas_call per bucket, VMEM-resident latent slab, in-kernel latent
gradient accumulation -- fvsrn_tpu/ops/fused_mega.py) with the
hand-written adjoint (fvsrn_tpu/ops/fused_dvr_bwd.py), under
saturation-clamped march planning (probe_saturation_tmax) and the
exact gated early-out adjoint.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_MRAYS = 13.1
WIDTH = HEIGHT = 512
STEPSIZE = 1.0 / 512
TIMED_FRAMES = 6
GATE_RAYS = 16384          # oracle-comparison subset (64 tiles)
GATE_IMG_TOL = 2e-2        # reference's fp16 fidelity contract
GATE_GRAD_TOL = 5e-3       # relative, on grad norms


def _wait_for_device(jax, attempts=20, delay_s=60):
    """The tunnel can be transiently UNAVAILABLE after job churn;
    retry before giving up (observed: outages of tens of minutes)."""
    for i in range(attempts):
        try:
            return jax.devices()
        except RuntimeError as e:
            print(f"device attempt {i}: {e}", file=sys.stderr)
            time.sleep(delay_s)
    return jax.devices()  # final attempt, raise for real


def main():
    root = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, root)
    import jax
    os.makedirs(os.path.join(root, ".jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _wait_for_device(jax)
    import jax.numpy as jnp
    import fvsrn_tpu as fv
    from __graft_entry__ import _build_flagship
    from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,
                                  generate_rays)
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets,
                                         probe_saturation_tmax)
    from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                         max_steps_bound, trace_dvr)

    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 10.0, 30.0], positions=[0.0, 0.5, 1.0])
    model = LoadedModel.from_checkpoint(
        os.path.join(root, "assets", "flagship_mlobb.hdf5"), tf=tf)
    # device-resident params: numpy checkpoint leaves would re-upload
    # ~2 MB per frame through the axon tunnel inside the timing loop
    net = jax.device_put(model.network)
    tft = jax.device_put(tf.tensor)
    nvol = VolumeInterpolationNetwork.make(net)
    bm = np.asarray((-0.5, -0.5, -0.5), np.float32)
    bs = np.asarray((1.0, 1.0, 1.0), np.float32)
    steps = max_steps_bound((1.0, 1.0, 1.0), STEPSIZE)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, WIDTH, HEIGHT,
                         fov_y_radians=0.7853981633974483)
    # (seg, tile) = (32, 128) with 16x8 pixel blocks: the round-4 shape
    # sweep (tools/sweep_mega_shapes.py) measured 230 ms/frame fwd+bwd vs
    # 255 at the round-3 (32, 256) -- smaller tiles shrink the certified
    # latent footprint that the resolve/xfold/dtab sections scale with.
    perm, _inv = block_ray_permutation(WIDTH, HEIGHT, 16, 8)
    rs_np = np.asarray(s).reshape(-1, 3)[perm]
    rd_np = np.asarray(d).reshape(-1, 3)[perm]

    # camera-static planning pre-pass (excluded from frame timing, like
    # the reference's host-side setup): saturation probe + tile buckets
    clip = probe_saturation_tmax(rs_np, rd_np, nvol, tf,
                                 stepsize=STEPSIZE, max_steps=steps,
                                 coarse=8, margin_steps=16)
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEPSIZE,
                            seg=32, tile=128, n_buckets=3,
                            grid_sizes=(32, 32, 32), tmax_clip=clip)
    rs, rd = jnp.asarray(rs_np), jnp.asarray(rd_np)

    def make_fb(plan_, rs_, rd_):
        @jax.jit
        def fb(net, tft):
            def loss_fn(n, t):
                c = fused_trace_dvr_bucketed(
                    rs_, rd_, n, bm, bs, t, plan=plan_,
                    stepsize=STEPSIZE, seg=32, tile=128,
                    enable_early_out=True, differentiable=True,
                    latent_mode="boxfeat", table_dtype=jnp.bfloat16,
                    engine="mega")
                return jnp.mean(c ** 2), c
            (loss, img), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(net, tft)
            return loss, img, grads
        return fb

    fb = make_fb(plan, rs, rd)
    loss, img_f, grads_f = fb(net, tft)
    _ = float(loss)  # warm-up sync (block_until_ready lies on axon)

    # ---- numeric gate: fused vs plain-lattice oracle on a subset ----
    # rays from the start of the middle bucket (median march lengths)
    gs = plan.dead + plan.group_sizes[0]
    rs_perm = rs_np[plan.perm]
    rd_perm = rd_np[plan.perm]
    gate_rs = rs_perm[gs:gs + GATE_RAYS]
    gate_rd = rd_perm[gs:gs + GATE_RAYS]
    gate_clip = plan.tmax_clip[gs:gs + GATE_RAYS]
    gplan = plan_ray_buckets(gate_rs, gate_rd, bm, bs,
                             stepsize=STEPSIZE, seg=32, tile=128,
                             n_buckets=1, grid_sizes=(32, 32, 32),
                             tmax_clip=gate_clip)
    gfb = make_fb(gplan, jnp.asarray(gate_rs), jnp.asarray(gate_rd))
    _, gimg_f, ggrads_f = gfb(net, tf.tensor)
    cfg = RayEvaluationSteppingDvr.make(stepsize=STEPSIZE,
                                        enable_early_out=False)
    gsteps = int(max(gplan.group_steps))

    @jax.jit
    def plain_fb(net, tft):
        def loss_fn(n, t):
            v = VolumeInterpolationNetwork.make(n)
            out = trace_dvr(jnp.asarray(gate_rs), jnp.asarray(gate_rd),
                            v, fv.TransferFunctionPiecewiseLinear(
                                tensor=t),
                            cfg, gsteps, checkpoint_chunk=1,
                            lattice=True,
                            tmax_in=jnp.asarray(gate_clip)[:, None])
            return jnp.mean(out.color ** 2), out.color
        (_, img), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(net, tft)
        return img, grads

    gimg_p, ggrads_p = plain_fb(net, tf.tensor)
    # the fused subset loss is mean over GATE_RAYS too -> same scale
    img_diff = float(np.abs(np.asarray(gimg_f) - np.asarray(gimg_p))
                     .max())
    rels = []
    for a, b in zip(jax.tree.leaves(ggrads_f), jax.tree.leaves(ggrads_p)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        nb = np.linalg.norm(b)
        if nb > 1e-12:
            rels.append(np.linalg.norm(a - b) / nb)
    grad_rel = float(max(rels)) if rels else float("nan")
    gate_ok = img_diff < GATE_IMG_TOL and grad_rel < GATE_GRAD_TOL
    print(f"gate: img max|diff| {img_diff:.2e}, grad-norm rel err "
          f"{grad_rel:.2e} -> {'ok' if gate_ok else 'FAIL'}",
          file=sys.stderr)

    # ---- timed frames (trained scene) ----
    # steady-state training throughput: frames dispatched back-to-back,
    # one sync at the end -- a real training loop never fetches the loss
    # every step, and the reference's GPUTimer measures device events,
    # not host round-trips through the tunnel.
    # 3 timed groups of TIMED_FRAMES each (one end-of-group sync);
    # the mean over groups smooths tunnel/clock interference that a
    # single group samples at one instant (measured ~10% between-run
    # spread on otherwise identical code).
    group_dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        losses = [fb(net, tft)[0] for _ in range(TIMED_FRAMES)]
        _ = [float(v) for v in losses]
        group_dts.append((time.perf_counter() - t0) / TIMED_FRAMES)
    dt = float(np.mean(group_dts))
    mrays = WIDTH * HEIGHT / dt / 1e6
    print(f"trained scene: {dt:.3f}s/frame "
          f"(groups: {', '.join(f'{g:.3f}' for g in group_dts)})",
          file=sys.stderr)

    # ---- secondary arm: trained-scene FORWARD-only (the reference's
    # own timing mode is forward-only interactive rendering), measured
    # THROUGH THE PRODUCT API -- LoadedModel.prepare_network_render
    # runs the same probe+plan+megakernel planning as this bench
    # (round-4 contract: the bench number IS the product number) ----
    model.config = RayEvaluationSteppingDvr.make(stepsize=STEPSIZE)
    # 4 cameras = 3 timed groups after the warm-up discard (same
    # camera -> one compiled plan; mean over groups, same smoothing
    # rationale as the fwd+bwd arm above)
    fwd_ms, fwd_std, _ = model.time_rendering([cam] * 4, WIDTH, HEIGHT,
                                              "FUSED",
                                              repeats=TIMED_FRAMES)
    dt_f = fwd_ms / 1e3
    print(f"forward groups std: {fwd_std:.1f} ms", file=sys.stderr)
    print(f"trained forward-only (product API): {dt_f:.3f}s/frame",
          file=sys.stderr)

    # ---- secondary arm: random-weight flagship (round-2 contract) ----
    vol_r, tf_r, _cfg = _build_flagship()
    plan_r = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEPSIZE,
                              seg=32, tile=128, n_buckets=3,
                              grid_sizes=(32, 32, 32))
    fb_r = make_fb(plan_r, rs, rd)
    net_r = jax.device_put(vol_r.network)
    tft_r = jax.device_put(tf_r.tensor)
    _ = float(fb_r(net_r, tft_r)[0])
    t0 = time.perf_counter()
    losses = [fb_r(net_r, tft_r)[0] for _ in range(4)]
    _ = [float(v) for v in losses]
    dt_r = (time.perf_counter() - t0) / 4
    print(f"random weights: {dt_r:.3f}s/frame over 4", file=sys.stderr)

    mrays_f = WIDTH * HEIGHT / dt_f / 1e6
    print(json.dumps({
        # Primary "value" = BASELINE.json's contracted metric: the
        # fwd+bwd training-step rate. The reference's own harness
        # (eval_VolumetricFeatures.py:147-200) times forward-only
        # frames -- that like-for-like rate is the named field
        # "forward_mrays" so both comparisons are always on record.
        "metric": "Mrays/s/chip fused SRN DVR fwd+bwd at 512^2 "
                  "(stepsize 1/512, trained fV-SRN 32:32:32+latent-grid "
                  "flagship; forward-only reported as forward_mrays)",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "gate": "ok" if gate_ok else "fail",
        "gate_img_max_abs_diff": round(img_diff, 6),
        "gate_grad_norm_rel_err": round(grad_rel, 6),
        "forward_mrays": round(mrays_f, 4),
        "forward_vs_baseline": round(mrays_f / BASELINE_MRAYS, 4),
        "random_weights_fwd_bwd_mrays": round(
            WIDTH * HEIGHT / dt_r / 1e6, 4),
    }))


if __name__ == "__main__":
    main()
