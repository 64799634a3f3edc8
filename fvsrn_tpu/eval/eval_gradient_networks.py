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

    # shaded-DVR render through the FUSED in-kernel-adjoint normal path
    # vs the plain oracle (reference: the TC kernel's evalNormal +
    # Lambert epilogue, renderer_volume_tensorcores.cuh:1202-1450)
    import time

    from ..brdf import BRDFLambert
    from ..camera import CameraOnASphere, generate_rays
    from ..ops.fused_dvr import fused_trace_dvr
    from ..raytracer.dvr import (RayEvaluationSteppingDvr,
                                 max_steps_bound, trace_dvr)
    from ..train.losses import ssim
    from ..transfer import TransferFunctionPiecewiseLinear

    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.6, 0.3], [0.4, 0.6, 1.0]], opacity=[2.0, 20.0],
        positions=[0.0, 1.0])
    brdf = BRDFLambert.make(light=(0.3, -0.8, 0.5), ambient=0.3)
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 128,
                                        enable_early_out=False,
                                        need_normals=True)
    steps = max_steps_bound((1.0, 1.0, 1.0), 1 / 128)
    cam = CameraOnASphere.make(pitch=0.35, yaw=0.8, distance=1.6)
    rs, rd = generate_rays(cam, 128, 128)
    rs = jnp.reshape(rs, (-1, 3))
    rd = jnp.reshape(rd, (-1, 3))
    on_tpu = jax.devices()[0].platform == "tpu"

    # shaded DVR through the MEGAKERNEL engine (whole march = one
    # pallas_call, in-kernel adjoint normals + Lambert shading via the
    # shared _march_epilogue); oracle = plain lattice-mode trace
    from ..ops.fused_mega import mega_trace_dvr

    @jax.jit
    def render_fused(net, tft):
        return mega_trace_dvr(
            rs, rd, net, (-0.5, -0.5, -0.5), (1.0, 1.0, 1.0), tft,
            stepsize=1 / 128, max_steps=steps, seg=16, tile=128,
            enable_early_out=False, need_normals=True, brdf=brdf,
            interpret=not on_tpu).color

    fused_img = np.asarray(render_fused(net, tf.tensor))
    t0 = time.perf_counter()
    fused_img = np.asarray(render_fused(net, tf.tensor))
    fused_ms = (time.perf_counter() - t0) * 1e3
    nv = VolumeInterpolationNetwork.make(net)
    plain_img = np.asarray(trace_dvr(rs, rd, nv, tf, cfg, steps,
                                     brdf=brdf, lattice=True).color)
    a = jnp.moveaxis(jnp.asarray(fused_img).reshape(1, 128, 128, 4),
                     -1, 1)
    b = jnp.moveaxis(jnp.asarray(plain_img).reshape(1, 128, 128, 4),
                     -1, 1)
    s = float(ssim(a, b))
    print(f"[shaded DVR] megakernel in-kernel-adjoint render: "
          f"{fused_ms:.1f} ms at 128^2, SSIM vs plain {s:.4f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
