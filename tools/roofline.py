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
    n = 8 * 1024 * 128          # 1M lanes, fits VMEM
    reps = 512                  # dependent FMA chain length

    def chain(x):
        def body(c, _):
            return c * jnp.float32(1.0000001).astype(c.dtype) \
                + jnp.float32(1e-7).astype(c.dtype), None
        c, _ = lax.scan(body, x, None, length=reps)
        return c

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.ones((8 * 128, 1024), dtype)
        f = jax.jit(chain)
        _ = float(jnp.sum(f(x).astype(jnp.float32)))
        t0 = time.perf_counter()
        for _i in range(4):
            _ = float(jnp.sum(f(x).astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 4
        # 2 ops per chain step (mul + add)
        rate = n * reps * 2 / dt
        print(f"VPU {jnp.dtype(dtype).name}: {rate/1e12:.2f} Tops "
              f"({dt*1e3:.1f} ms for {reps} chained FMAs on 1M lanes)",
              flush=True)
        if dtype == jnp.float32:
            f32_rate = rate
        else:
            bf16_rate = rate

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

    for tag, ops, meas_ms in (("fwd", OPS_PER_LANE_FWD, None),
                              ("fwd+bwd", OPS_PER_LANE_FWDBWD, None)):
        floor_ms = lanes * ops / f32_rate * 1e3
        print(f"{tag}: {ops} ops/lane -> VPU floor "
              f"{floor_ms:.1f} ms/frame at the calibrated "
              f"{f32_rate/1e12:.2f} Tops", flush=True)

    print(f"bf16/f32 VPU rate ratio: {bf16_rate/f32_rate:.2f} "
          f"(>1.5 would justify a bf16 act section; ~1.0 means the "
          f"VPU is dtype-agnostic and selective bf16 buys nothing)",
          flush=True)


if __name__ == "__main__":
    main()
