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
    """One timed run: rays/s of the DP-sharded render on n devices."""
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


def _spawn_one(n: int, args) -> dict:
    """Run ONE device count in a fresh process: the virtual CPU platform
    is created with EXACTLY n devices and the process is pinned to n
    physical cores (taskset), so each virtual device maps ~1:1 onto a
    core. Normalization: 1 device on 1 core is the linear-scaling unit
    -- the shortfall at n devices on n cores is sharding overhead +
    shared-memory-bandwidth contention, not thread oversubscription
    (which is what the round-2 artifact measured: 8 virtual devices'
    thread pools time-slicing 4 cores gave 0.602 'efficiency' at 8 and
    super-linear 1.211 at 4)."""
    import os
    import shutil
    import subprocess
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n}")
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, "-m", "fvsrn_tpu.eval.eval_scaling",
           "--devices", str(n), "--width", str(args.width),
           "--height", str(args.height), "--stepsize",
           str(args.stepsize), "--trials", str(args.trials),
           # env JAX_PLATFORMS is ignored when a platform plugin forces
           # itself; the flag goes through jax.config.update instead
           "--platform", "cpu"]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])[str(n)]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+",
                   default=[1, 2, 4, 8])
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--stepsize", type=float, default=1 / 64)
    p.add_argument("--trials", type=int, default=1,
                   help="independent timed trials; reports mean and std")
    p.add_argument("--platform", default=None,
                   help="cpu = virtual multi-device CPU mesh (set "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    p.add_argument("--spawn", action="store_true",
                   help="one pinned subprocess per device count (the "
                        "contention-controlled harness; see _spawn_one)")
    args = p.parse_args(argv)

    if args.spawn:
        import multiprocessing
        cores = multiprocessing.cpu_count()
        results = {}
        base = None
        for n in args.devices:
            if n > cores:
                print(f"skip n={n} (only {cores} physical cores; "
                      "devices beyond cores measure time-slicing, not "
                      "scaling)", file=sys.stderr)
                continue
            r = _spawn_one(n, args)
            if base is None:
                base = r["rays_per_s"] / n
            r["efficiency_vs_linear"] = round(
                r["rays_per_s"] / (base * n), 4)
            results[str(n)] = r
            print(f"n={n}: {r['rays_per_s'] / 1e6:.3f} Mrays/s "
                  f"+- {r.get('rays_per_s_std', 0) / 1e6:.3f} "
                  f"(efficiency {r['efficiency_vs_linear'] * 100:.1f}%)",
                  file=sys.stderr)
        print(json.dumps(results))
        return 0

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
        vals = [measure(n, args.width, args.height, args.stepsize)
                for _ in range(args.trials)]
        rays_s = float(np.mean(vals))
        if base is None:
            base = rays_s
        eff = rays_s / (base * n / args.devices[0])
        results[str(n)] = {"rays_per_s": round(rays_s, 1),
                           "efficiency_vs_linear": round(eff, 4)}
        if args.trials > 1:
            results[str(n)]["rays_per_s_std"] = round(
                float(np.std(vals)), 1)
        print(f"n={n}: {rays_s / 1e6:.3f} Mrays/s "
              f"(efficiency {eff * 100:.1f}%)", file=sys.stderr)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
