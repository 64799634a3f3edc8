"""Inspect the DP screen step's gradient all-reduce scheduling.

Lowers make_dp_screen_train_step on the virtual CPU mesh and reports
where each all-reduce sits in the stablehlo/optimized HLO relative to
the backward's compute.

WHAT IT SHOWS (the honest finding, PERF.md round-3): for the fV-SRN
model shape the psum CANNOT overlap the backward march, with or
without ``overlap_grads`` -- every gradient (latent grid included) is a
sum over all rays/segments, produced as an output of the single
backward scan/mega op (%363#NN below), so its all-reduce's operand only
exists when the whole backward has finished. ``_pmean_in_bwd`` issues
the latent psum at the earliest data-dependency-legal point; XLA's
combiner then (correctly) folds all leaves into ONE grouped ~2.1 MB
all-reduce -- a single bandwidth-bound launch, which at this gradient
size is optimal. The mechanism pays only for models whose per-layer
gradients finalize at different times (deep nets / meta-network
variants), where the early-issued collectives become async and ride
ICI under the remaining backward.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/show_overlap.py
"""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from fvsrn_tpu.camera import CameraOnASphere, generate_rays
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.parallel.mesh import make_mesh
    from fvsrn_tpu.parallel.train_step import make_dp_screen_train_step
    from fvsrn_tpu.raytracer.dvr import RayEvaluationSteppingDvr
    from fvsrn_tpu.train.losses import LossNetScreen
    from fvsrn_tpu.train.optimizer import make_optimizer
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear

    n = min(8, len(jax.devices()))
    mesh = make_mesh(n)
    rng = np.random.default_rng(0)
    latent = LatentSpace(static_grid=(
        rng.standard_normal((16, 32, 32, 32)) * 0.1).astype(np.float32))
    net = SceneRepresentationNetwork.make(
        layers="32:32:32", activation="SnakeAlt:2", num_fourier=14,
        output_mode="density:direct", latent=latent, seed=1)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1.0, 0.3, 0.1], [0.3, 1.0, 0.5]], opacity=[0.0, 20.0],
        positions=[0.0, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 32,
                                        enable_early_out=False)
    opt = make_optimizer("Adam", lr=1e-3)
    w = h = 16
    steps = 56
    rs, rd, tgt = [], [], []
    for i in range(n):
        s, d = generate_rays(
            CameraOnASphere.make(pitch=0.1 * i, yaw=0.4 * i,
                                 distance=1.6), w, h)
        rs.append(np.asarray(s).reshape(-1, 3))
        rd.append(np.asarray(d).reshape(-1, 3))
        tgt.append(rng.random((w * h, 4)).astype(np.float32))
    rs, rd, tgt = (jnp.asarray(np.stack(a)) for a in (rs, rd, tgt))
    sloss = LossNetScreen(l1=1.0)

    for overlap in (False, True):
        step = make_dp_screen_train_step(
            mesh, tf, cfg, sloss, opt, width=w, height=h,
            max_steps=steps, overlap_grads=overlap)
        lowered = step.lower(net, opt.init(net), rs, rd, tgt)
        # 1. DATA DEPENDENCIES (pre-optimization stablehlo): with
        # overlap_grads the latent psum consumes a value produced
        # upstream in the backward (e.g. %all_reduce(%335)), while the
        # trailing per-leaf pmeans consume outputs of the LATER grad
        # call (%363#22..#31) -- i.e. the latent collective is
        # schedulable before the rest of the backward completes.
        stxt = lowered.as_text().splitlines()
        fn = "?"
        ops = []
        for ln in stxt:
            m = re.search(r"func\.func .*@(\S+)\(", ln)
            if m:
                fn = m.group(1)
            if "all_reduce" in ln and "replica_groups" in ln:
                m = re.search(r"all_reduce\"\((%[0-9#a-z_]+)\)", ln)
                ops.append((fn, m.group(1) if m else "?"))
        print(f"overlap_grads={overlap}: all_reduce (function, operand):")
        for fn, o in ops:
            print(f"    {fn}: {o}")
        # 2. what the compiler made of it (CPU backend): XLA's
        # all-reduce COMBINER folds them into one grouped op at this
        # size (~2.1 MB total gradient) -- the right call: one launch,
        # bandwidth-bound either way. The mechanism matters when a
        # gradient exceeds the combiner threshold; the issue position
        # above is what enables the async overlap then.
        lines = lowered.compile().as_text().splitlines()
        ars = [(i, ln.strip()[:110]) for i, ln in enumerate(lines)
               if "all-reduce(" in ln]
        last_fusion = max((i for i, ln in enumerate(lines)
                           if " fusion(" in ln), default=-1)
        print(f"  compiled: {len(ars)} all-reduce ops at lines "
              f"{[i for i, _ in ars]} of {len(lines)}; last compute "
              f"fusion at {last_fusion}")


if __name__ == "__main__":
    main()
