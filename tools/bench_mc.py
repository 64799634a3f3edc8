"""MC delta-tracking eval of an SRN: plain vs fused sampler (VERDICT r2
item 6) and round-4 live-ray compaction (VERDICT r3 item 7 -- walks
were alive-tail-bound; reference analog: the tensor-core MLP inside
the MC kernel + per-warp divergence economics,
renderer_ray_evaluation_monte_carlo.cuh:59-317).

Usage: python tools/bench_mc.py [width]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import fvsrn_tpu as fv
    from fvsrn_tpu.camera import CameraOnASphere, generate_rays
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.phase import PhaseFunctionHenyeyGreenstein
    from fvsrn_tpu.raytracer.montecarlo import (RayEvaluationMonteCarlo,
                                                make_mc_sampler, trace_mc)

    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 10.0, 30.0], positions=[0.0, 0.5, 1.0])
    model = LoadedModel.from_checkpoint(
        "/root/repo/assets/flagship_mlobb.hdf5", tf=tf)
    vol = VolumeInterpolationNetwork.make(model.network)
    phase = PhaseFunctionHenyeyGreenstein.make(g=0.3)
    config = RayEvaluationMonteCarlo.make(
        max_absorption=30.0, num_bounces=2, max_iterations=256)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    s, d = generate_rays(cam, W, H)
    rs = jnp.reshape(s, (-1, 3))
    rd = jnp.reshape(d, (-1, 3))
    key = jax.random.PRNGKey(7)
    sampler = make_mc_sampler(vol, tile=4096)

    def bench(tag, smp, frames=3, compact=False, schedule=None):
        @jax.jit
        def fn(rs, rd):
            out = trace_mc(key, rs, rd, vol, tf, phase, config,
                           sampler=smp, compact=compact,
                           compact_schedule=schedule,
                           use_fused=False)
            return jnp.mean(out.color)

        t0 = time.perf_counter()
        _ = float(fn(rs, rd))
        print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        vals = [fn(rs, rd) for _ in range(frames)]
        _ = [float(v) for v in vals]
        dt = (time.perf_counter() - t0) / frames
        print(f"{tag}: {dt*1000:.1f} ms/frame ({W*H/dt/1e6:.3f} "
              f"Mrays/s)", flush=True)
        return dt

    dt_f = bench("fused sampler", sampler)
    dt_p = bench("plain path", None)
    print(f"fused-vs-plain speedup: {dt_p/dt_f:.1f}x", flush=True)
    n = W * H
    dt_fc = bench("fused + compact", sampler, compact=True,
                  schedule=((16, max(4096, n // 4)),
                            (32, max(4096, n // 16))))
    for r0, r1 in ((8, 16), (16, 32), (24, 48)):
        sched = ((r0, max(4096, n // 4)), (r1, max(4096, n // 16)))
        dt_c = bench(f"fused + compact {sched}", sampler, compact=True,
                     schedule=sched)
    dt_pc = bench("plain + compact", None, compact=True)
    print(f"compaction speedup (fused): {dt_f/dt_fc:.2f}x, "
          f"(plain): {dt_p/dt_pc:.2f}x", flush=True)


if __name__ == "__main__":
    main()
