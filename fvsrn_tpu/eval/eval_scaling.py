"""Scaling-efficiency measurement: rays/s from 1 to N devices.

The distributed-rendering gate of BASELINE.json (config 5 / SURVEY §2.3):
rays sharded over the ``data`` mesh axis, SRN params + latent grid
replicated, target >= 85% scaling efficiency. The reference has no
distributed path; this harness is original TPU-first machinery. On a
single-chip machine it runs on the virtual CPU mesh
(--xla_force_host_platform_device_count) to validate the sharding; on a
pod slice the same code measures real ICI scaling.

Usage: python -m fvsrn_tpu.eval.eval_scaling [--devices 1 2 4 8]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def measure(n_devices: int, width: int, height: int, stepsize: float,
            repeats: int = 3) -> float:
    import jax
    import jax.numpy as jnp
    from ..camera import CameraOnASphere, generate_rays
    from ..models.latent import LatentSpace
    from ..models.network_volume import VolumeInterpolationNetwork
    from ..models.srn import SceneRepresentationNetwork
    from ..parallel.mesh import make_mesh, replicate, shard_batch
    from ..parallel.train_step import make_dp_render
    from ..raytracer.dvr import (RayEvaluationSteppingDvr,
                                 max_steps_bound, trace_dvr)
    from ..transfer import TransferFunctionPiecewiseLinear

    rng = np.random.default_rng(0)
    latent = LatentSpace(static_grid=(
        rng.standard_normal((8, 16, 16, 16)) * 0.05).astype(np.float32))
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=8,
        output_mode="density:direct", latent=latent, seed=1)
    vol = VolumeInterpolationNetwork.make(net)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.3, 0.1], [1.0, 1.0, 0.7]], opacity=[0.0, 20.0],
        positions=[0.0, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=stepsize,
                                        enable_early_out=False)
    steps = max_steps_bound((1.0, 1.0, 1.0), stepsize)

    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    rs, rd = generate_rays(cam, width, height)
    rs = jnp.reshape(rs, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))

    mesh = make_mesh(n_devices)

    def render_rays(rs, rd, vol, tf, cfg):
        return trace_dvr(rs, rd, vol, tf, cfg, steps).color

    sharded = make_dp_render(mesh, render_rays)
    volr = replicate(mesh, vol)
    tfr = replicate(mesh, tf)
    cfgr = replicate(mesh, cfg)
    rss, rds = shard_batch(mesh, (rs, rd))

    out = sharded(rss, rds, volr, tfr, cfgr)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = sharded(rss, rds, volr, tfr, cfgr)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / repeats
    return width * height / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+",
                   default=[1, 2, 4, 8])
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--stepsize", type=float, default=1 / 64)
    p.add_argument("--platform", default=None,
                   help="cpu = virtual multi-device CPU mesh (set "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    avail = len(jax.devices())
    results = {}
    base = None
    for n in args.devices:
        if n > avail:
            print(f"skip n={n} (only {avail} devices)", file=sys.stderr)
            continue
        rays_s = measure(n, args.width, args.height, args.stepsize)
        if base is None:
            base = rays_s
        eff = rays_s / (base * n / args.devices[0])
        results[str(n)] = {"rays_per_s": round(rays_s, 1),
                           "efficiency_vs_linear": round(eff, 4)}
        print(f"n={n}: {rays_s / 1e6:.3f} Mrays/s "
              f"(efficiency {eff * 100:.1f}%)", file=sys.stderr)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
