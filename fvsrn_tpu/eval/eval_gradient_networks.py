"""Gradient-quality evaluation of trained SRNs (reference:
applications/volnet/eval_GradientNetworks1_v2.py, eval_GradientNetworks2.py,
eval_CurvatureNetworks2.py — how well network gradients/normals match the
reference volume's, per gradient mode).

Trains one SRN on the scene, then scores the normals it produces via the
exact AD adjoint and via finite differences against the reference
volume's own FD normals (cosine similarity + L2). Curvature shading
itself is exercised by the iso renderer (raytracer/iso.py,
tests/test_dvr.py).

Usage: python -m fvsrn_tpu.eval.eval_gradient_networks
       [--scene S] [--epochs N] [--samples K]
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="IMPLICIT:MARSCHNER_LOBB")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--samples", type=int, default=64 * 64 * 4)
    p.add_argument("--eval-samples", type=int, default=8192)
    p.add_argument("--fd-step", type=float, default=1e-3)
    args = p.parse_args(argv)

    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.network_volume import VolumeInterpolationNetwork
    from ..train.main import _resolve_scene, run
    from ..utils.vecmath import safe_normalize
    from .sweep import default_options

    volume, _, _ = _resolve_scene(args.scene)
    opt = default_options(args.scene,
                          tempfile.mktemp(suffix=".hdf5"))
    opt.update(epochs=args.epochs, samples=args.samples,
               volumetric_features_channels=8,
               volumetric_features_resolution=16)
    net = run(opt)["network"]

    key = jax.random.PRNGKey(123)
    pos01 = jax.random.uniform(key, (args.eval_samples, 3),
                               minval=0.05, maxval=0.95)
    world = volume.box_min + pos01 * volume.box_size
    ref_n = safe_normalize(volume.eval_normal(world))

    rows = []
    for mode in ("adjoint", "fd"):
        nv = VolumeInterpolationNetwork.make(net, gradient_mode=mode,
                                             fd_step=args.fd_step)
        got = safe_normalize(nv.eval_normal(world))
        cosine = jnp.sum(got * ref_n, axis=-1)
        rows.append({
            "mode": mode,
            "mean_cosine": float(jnp.mean(cosine)),
            "l2": float(jnp.mean(jnp.sum((got - ref_n) ** 2, -1))),
        })
        print(f"[gradients] {mode}: cos {rows[-1]['mean_cosine']:.4f} "
              f"l2 {rows[-1]['l2']:.4f}", flush=True)
    print("mode     mean_cosine  l2")
    for r in rows:
        print(f"{r['mode']:<8} {r['mean_cosine']:<12.4f} {r['l2']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
