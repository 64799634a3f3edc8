#!/usr/bin/env python
"""Benchmark: SRN DVR forward+backward throughput on the real TPU.

North-star metric (BASELINE.json): Mrays/s/chip for the SRN DVR
forward+backward at 512^2, world stepsize 1/512 -- the timing configuration
of the reference's harness (reference: applications/volnet/
eval_VolumetricFeatures.py:147-200: 512x512, stepsize 1/512, GPUTimer,
first frame discarded as warm-up).

Baseline value: the reference stores no numbers (BASELINE.md); we use
13.1 Mrays/s = 512^2 px / 20 ms, the RTX 2070 TENSORCORES_MIXED
*forward-only* frame time scale implied by the paper's interactive-rate
claims (arXiv:2112.01579). Comparing our forward+backward against their
forward is conservative.

Measures the fused Pallas MEGAKERNEL path: the whole march as one
pallas_call per bucket (VMEM-resident latent slab, in-kernel latent
gradient accumulation -- fvsrn_tpu/ops/fused_mega.py) with the
hand-written adjoint core (fvsrn_tpu/ops/fused_dvr_bwd.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_MRAYS = 13.1
WIDTH = HEIGHT = 512
STEPSIZE = 1.0 / 512
RAY_CHUNK = 262144  # rays per jit call
TIMED_FRAMES = 4


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
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    # grad-of-scan programs compile slowly on this backend; cache them
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _wait_for_device(jax)
    import jax.numpy as jnp
    from __graft_entry__ import _build_flagship
    from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets)
    from fvsrn_tpu.raytracer.dvr import max_steps_bound

    vol, tf, cfg = _build_flagship()
    cfg = cfg.replace(stepsize=np.float32(STEPSIZE))
    steps = max_steps_bound(vol.box_size, STEPSIZE)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))

    @jax.jit
    def make_rays(matrix):
        s, d = generate_rays(matrix, WIDTH, HEIGHT,
                             fov_y_radians=0.7853981633974483)
        return s.reshape(-1, 3), d.reshape(-1, 3)

    ray_start, ray_dir = jax.block_until_ready(make_rays(matrix))

    bm = np.asarray(vol.box_min)
    bs = np.asarray(vol.box_size)

    # boxfeat latent path: lattice sampling + per-(tile, segment) sub-box
    # gathers need spatially coherent ray tiles -> 16x16 pixel blocks;
    # march-length tile bucketing slices off dead tiles and lets short
    # tiles stop early (camera-static host pre-pass)
    rs_np = np.asarray(ray_start)
    rd_np = np.asarray(ray_dir)
    perm, _inv = block_ray_permutation(WIDTH, HEIGHT, 16, 16)
    rs_np, rd_np = rs_np[perm], rd_np[perm]
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEPSIZE,
                            seg=32, tile=256, n_buckets=3,
                            grid_sizes=(32, 32, 32))
    ray_start = jnp.asarray(rs_np)
    ray_dir = jnp.asarray(rd_np)

    @jax.jit
    def fwd_bwd_chunk(vol, tf, cfg, rs, rd):
        def loss_fn(net, tft):
            c = fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEPSIZE,
                seg=32, tile=256, enable_early_out=False,
                differentiable=True, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine="mega")
            return jnp.mean(c ** 2)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            vol.network, tf.tensor)
        return loss, grads

    n_chunks = (WIDTH * HEIGHT) // RAY_CHUNK
    chunks = [(ray_start[i * RAY_CHUNK:(i + 1) * RAY_CHUNK],
               ray_dir[i * RAY_CHUNK:(i + 1) * RAY_CHUNK])
              for i in range(n_chunks)]
    chunks = jax.block_until_ready(chunks)

    def run_frame():
        total = 0.0
        for rs, rd in chunks:
            loss, grads = fwd_bwd_chunk(vol, tf, cfg, rs, rd)
        return loss

    # warm-up / compile (discarded like the reference); materialize to
    # force completion (block_until_ready does not block on the tunnel)
    float(run_frame())
    # steady-state training throughput: frames are dispatched
    # back-to-back and synced once at the end -- a real training loop
    # never fetches the loss every step, and the reference's GPUTimer
    # measures device events, not host round-trips. The per-frame
    # host->device dispatch latency through the tunnel (~50-70 ms) is
    # NOT device work and is excluded by amortizing it over the batch.
    t0 = time.perf_counter()
    losses = [run_frame() for _ in range(TIMED_FRAMES)]
    _ = [float(l) for l in losses]
    dt = (time.perf_counter() - t0) / TIMED_FRAMES
    print(f"mean frame: {dt:.3f}s over {TIMED_FRAMES}", file=sys.stderr)
    mrays = WIDTH * HEIGHT / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/s/chip SRN DVR fwd+bwd at 512^2 "
                  "(stepsize 1/512, fV-SRN 32:32:32+latent-grid config)",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
