"""Full cost map of the megakernel fwd and fwd+bwd via the timing-only
_ABLATE seams (fused_dvr/_fused_dvr_bwd/fused_mega): each seam guts one
kernel section so its share of the frame is measured directly, on the
trained-scene shipping config (512^2, clip+early-out, t256).

Usage: tools/tpurun.sh tools/ablate_mega_cost.py /tmp/ablate_cost.log
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

W = H = 512
STEP = 1.0 / 512
FRAMES = 6


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import fvsrn_tpu as fv
    from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,
                                  generate_rays)
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.ops import fused_dvr as fd
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets,
                                         probe_saturation_tmax)
    from fvsrn_tpu.raytracer.dvr import max_steps_bound

    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 10.0, 30.0], positions=[0.0, 0.5, 1.0])
    model = LoadedModel.from_checkpoint(
        "/root/repo/assets/flagship_mlobb.hdf5", tf=tf)
    net = model.network
    nvol = VolumeInterpolationNetwork.make(net)
    bm = np.asarray((-0.5, -0.5, -0.5), np.float32)
    bs = np.asarray((1.0, 1.0, 1.0), np.float32)
    steps = max_steps_bound((1.0, 1.0, 1.0), STEP)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, W, H, fov_y_radians=0.7853981633974483)
    perm, _inv = block_ray_permutation(W, H, 16, 16)
    rs_np = np.asarray(s).reshape(-1, 3)[perm]
    rd_np = np.asarray(d).reshape(-1, 3)[perm]
    clip = probe_saturation_tmax(rs_np, rd_np, nvol, tf, stepsize=STEP,
                                 max_steps=steps, coarse=8,
                                 margin_steps=16)
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                            seg=32, tile=256, n_buckets=3,
                            grid_sizes=(32, 32, 32), tmax_clip=clip)
    rs, rd = jnp.asarray(rs_np), jnp.asarray(rd_np)

    def bench(tag, seams, *, bwd, frames=FRAMES):
        fd._ABLATE = frozenset(seams)
        try:
            # enable_early_out=False: the timing fakes corrupt the
            # computed densities, so any VALUE-dependent gating (the
            # in-kernel saturation votes) would distort the timing
            # through the data; the saturation-clamped plan (geometry-
            # static) stays on. Grad leaves are folded into the scalar
            # so XLA cannot DCE the backward.
            if bwd:
                @jax.jit
                def fn(net, tft):
                    def loss_fn(n, t):
                        c = fused_trace_dvr_bucketed(
                            rs, rd, n, bm, bs, t, plan=plan,
                            stepsize=STEP, seg=32, tile=256,
                            enable_early_out=False, differentiable=True,
                            latent_mode="boxfeat",
                            table_dtype=jnp.bfloat16, engine="mega")
                        return jnp.mean(c ** 2)
                    loss, g = jax.value_and_grad(
                        loss_fn, argnums=(0, 1))(net, tft)
                    return loss + sum(jnp.sum(l) for l in
                                      jax.tree.leaves(g))
            else:
                @jax.jit
                def fn(net, tft):
                    c = fused_trace_dvr_bucketed(
                        rs, rd, net, bm, bs, tft, plan=plan,
                        stepsize=STEP, seg=32, tile=256,
                        enable_early_out=False, differentiable=False,
                        latent_mode="boxfeat",
                        table_dtype=jnp.bfloat16, engine="mega")
                    return jnp.mean(c ** 2)

            _ = float(fn(net, tf.tensor))
            t0 = time.perf_counter()
            outs = [fn(net, tf.tensor) for _ in range(frames)]
            _ = [float(o) for o in outs]
            dt = (time.perf_counter() - t0) / frames
            print(f"{tag}: {dt*1000:.1f} ms/frame", flush=True)
            return dt
        finally:
            fd._ABLATE = frozenset()

    only = os.environ.get("ABLATE_ONLY")
    for bwd in ((only == "bwd",) if only else (False, True)):
        kind = "fwd+bwd" if bwd else "fwd"
        base = bench(f"[{kind}] full", (), bwd=bwd)
        for seam in ("l1mm", "hidmm", "chainmm", "act", "fourier",
                     "resolve", "wzy", "xfold", "dtab",
                     "blendadj", "tfadj", "wgrad"):
            if not bwd and seam in ("chainmm", "dtab", "blendadj",
                                    "tfadj", "wgrad"):
                continue
            dt = bench(f"[{kind}] no-{seam}", (seam,), bwd=bwd)
            print(f"    -> {seam} share {1000*(base-dt):+.1f} ms",
                  flush=True)
        bench(f"[{kind}] no-allmm",
              ("l1mm", "hidmm", "chainmm", "resolve", "dtab"), bwd=bwd)
        bench(f"[{kind}] no-alltrig", ("act", "fourier"), bwd=bwd)
    print("DONE")


if __name__ == "__main__":
    main()
