"""Roofline ledger for the dense-TF megakernel floor (VERDICT r4 next
item 2): calibrate the chip's effective VPU elementwise rate (f32 AND
bf16 -- the selective-bf16-activation question), derive the per-lane
op floor from the PERF.md cost map, and place the measured frame times
against it.

Methodology:
- VPU calibration: a jitted chain of K dependent multiply-adds over a
  VMEM-sized f32/bf16 array; rate = lanes * K / time. This measures the
  achievable elementwise throughput INCLUDING Mosaic's lowering (for
  bf16: whether the VPU runs bf16 at double rate or upcasts).
- Lane count: sum over plan buckets of rays * clipped steps (the
  mask-waste-inclusive lane count the kernel actually computes).
- Op counts per lane (hand count, fused_dvr.py sections; see PERF.md
  round 3): forward ~ act 96 units x 12 ops + xfold 256 + fourier/TF/
  blend ~ 500 => ~1900; fwd+bwd ~ 4500 (shared-trig act+deriv 18/unit,
  replay, adjoint chains).

Usage: tools/tpurun.sh tools/roofline.py /tmp/roofline.log
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OPS_PER_LANE_FWD = 1900      # hand count, see module doc
OPS_PER_LANE_FWDBWD = 4500


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # ---- VPU elementwise rate calibration ----
    # UNROLLED dependent multiply-add chain (XLA fuses it into one
    # kernel, lanes stay in registers/VMEM), measured DIFFERENTIALLY:
    # rate = extra ops / (time(long chain) - time(short chain)). The
    # subtraction cancels the per-dispatch host latency through the
    # axon tunnel (~26 ms, which otherwise swamps a single-dispatch
    # microbench) and any constant launch/IO cost.
    n = 8 * 1024 * 128          # 1M lanes
    reps_lo, reps_hi = 256, 4096

    def make_chain(reps):
        # 4 independent interleaved chains: a single dependent chain is
        # VPU-LATENCY-bound (~0.75 Tops measured); the kernel's real op
        # stream has ILP, so calibrate with ILP 4. Constants are exact
        # in bf16 (1 + 1/128, 2^-10) so the bf16 chain does not fold.
        def chain(xs):
            a = jnp.float32(1.0078125).astype(xs[0].dtype)
            b = jnp.float32(-0.0009765625).astype(xs[0].dtype)
            for _ in range(reps):
                xs = tuple(x * a + b for x in xs)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in xs)
        return jax.jit(chain)

    rates = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        xs = tuple(jnp.full((8 * 128, 256), 0.5 + 0.1 * i, dtype)
                   for i in range(4))
        dts = {}
        for reps in (reps_lo, reps_hi):
            f = make_chain(reps)
            _ = float(f(xs))
            best = np.inf
            for _i in range(6):
                t0 = time.perf_counter()
                _ = float(f(xs))
                best = min(best, time.perf_counter() - t0)
            dts[reps] = best
        rate = n * (reps_hi - reps_lo) * 2 / (dts[reps_hi]
                                              - dts[reps_lo])
        print(f"VPU {jnp.dtype(dtype).name}: {rate/1e12:.2f} Tops "
              f"(dt {dts[reps_lo]*1e3:.2f} -> {dts[reps_hi]*1e3:.2f} ms "
              f"for {reps_lo} -> {reps_hi} chained FMAs on 1M lanes)",
              flush=True)
        rates[jnp.dtype(dtype).name] = rate
    f32_rate = rates["float32"]
    bf16_rate = rates["bfloat16"]

    # ---- dense-scene lane count + measured frame times ----
    from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,
                                  generate_rays)
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         plan_ray_buckets,
                                         probe_saturation_tmax)
    from fvsrn_tpu.raytracer.dvr import max_steps_bound
    from fvsrn_tpu.scenes import dense_scene

    W = H = 512
    STEP = 1.0 / 512
    volume, tf, ckpt = dense_scene()
    model = LoadedModel.from_checkpoint(ckpt, tf=tf)
    nvol = VolumeInterpolationNetwork.make(model.network)
    bm = np.asarray((-0.5,) * 3, np.float32)
    bs = np.asarray((1.0,) * 3, np.float32)
    steps = max_steps_bound((1.0, 1.0, 1.0), STEP)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, W, H, fov_y_radians=0.7853981633974483)
    perm, _ = block_ray_permutation(W, H, 16, 8)
    rs_np = np.asarray(s).reshape(-1, 3)[perm]
    rd_np = np.asarray(d).reshape(-1, 3)[perm]
    clip = probe_saturation_tmax(rs_np, rd_np, nvol, tf, stepsize=STEP,
                                 max_steps=steps, coarse=8,
                                 margin_steps=16)
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                            seg=32, tile=128, n_buckets=3,
                            grid_sizes=(32, 32, 32), tmax_clip=clip)
    lanes = sum(int(sz) * int(st) for sz, st in
                zip(plan.group_sizes, plan.group_steps))
    print(f"planned lanes (rays x clipped steps, incl. mask waste): "
          f"{lanes/1e6:.1f} M", flush=True)

    # measured dense frame times (bench.py scan protocol, BENCH_r05)
    MEAS = {"fwd": (0.077, OPS_PER_LANE_FWD),
            "fwd+bwd": (0.223, OPS_PER_LANE_FWDBWD)}
    for tag, (sec, ops) in MEAS.items():
        eff = lanes * ops / sec
        print(f"{tag}: measured {sec*1e3:.0f} ms, {ops} ops/lane "
              f"-> EFFECTIVE {eff/1e12:.2f} Tops "
              f"({eff/f32_rate:.1f}x the XLA-fusion chain rate; "
              f"v5e VPU issue peak ~3.9-7.7 Tops)", flush=True)

    print(f"bf16/f32 VPU rate ratio: {bf16_rate/f32_rate:.2f} "
          f"(>1.5 would justify a bf16 act section; ~1.0 means the "
          f"VPU is dtype-agnostic and selective bf16 buys nothing)",
          flush=True)


if __name__ == "__main__":
    main()
