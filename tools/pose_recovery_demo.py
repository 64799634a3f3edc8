"""Camera pose recovery demo on the trained flagship (real TPU).

The headline use case of the reference's differentiable camera
(renderer/camera.h Parameter<double3>): given one rendered view of the
trained fV-SRN from an unknown pose, recover pitch/yaw/distance by
Levenberg-Marquardt through the fused MEGAKERNEL forward
(fvsrn_tpu/train/pose.py; see PERF.md round-4 for why LM, not Adam).

Writes POSE_R04.json {err0, err1, err_ratio, cost0, cost1, iters} and
/tmp/pose_{target,start,recovered}.png.

Usage: tools/tpurun.sh tools/pose_recovery_demo.py /tmp/pose_demo.log
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = 64
S = 4                 # fixed supersampling jitter
STEP = 1.0 / 128
FOV = 0.7853981633974483


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import fvsrn_tpu as fv
    from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.ops.fused_dvr import certify_boxfeat
    from fvsrn_tpu.ops.fused_mega import mega_trace_dvr
    from fvsrn_tpu.raytracer.dvr import max_steps_bound
    from fvsrn_tpu.train.pose import make_pose_render, recover_pose

    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 10.0, 30.0], positions=[0.0, 0.5, 1.0])
    model = LoadedModel.from_checkpoint(
        os.path.join(ROOT, "assets", "flagship_mlobb.hdf5"), tf=tf)
    net = model.network
    bm, bs = (-0.5, -0.5, -0.5), (1.0, 1.0, 1.0)
    steps = max_steps_bound((1.0, 1.0, 1.0), STEP)
    pyd_true = np.asarray([0.3, 0.5, 1.6], np.float32)
    pert = np.asarray([-0.04, 0.05, -0.03], np.float32)
    pyd0 = pyd_true + pert

    # ONE boxfeat certificate with a pose-margin: certified from the
    # start pose over rays + 8 grid cells of slack so every pose the LM
    # iteration visits stays inside the certified window (the spec is a
    # static kernel arg; recertifying per step would recompile).
    m0 = np.asarray(camera_matrix(CameraOnASphere(
        center=np.zeros(3, np.float32), pitch_yaw_distance=pyd0)))
    s0, d0 = generate_rays(m0, W, W, fov_y_radians=FOV)
    spec = certify_boxfeat(
        np.asarray(s0).reshape(-1, 3), np.asarray(d0).reshape(-1, 3),
        (32, 32, 32), bm, bs, stepsize=STEP, max_steps=steps,
        seg=16, tile=256, margin=8)
    print("spec", spec, flush=True)

    @jax.jit
    def render_rays(s, d):
        return mega_trace_dvr(
            s, d, net, bm, bs, tf.tensor, stepsize=STEP,
            max_steps=steps, seg=16, tile=256, enable_early_out=False,
            differentiable=False, subbox=spec,
            table_dtype=jnp.bfloat16)

    render = make_pose_render(render_rays, W, W, fov_y_radians=FOV,
                              supersample=S)
    t0 = time.time()
    target = np.asarray(render(jnp.asarray(pyd_true)))
    print("target render %.1fs" % (time.time() - t0), flush=True)

    t0 = time.time()
    res = recover_pose(render, target, pyd0, iterations=15)
    wall = time.time() - t0
    e0 = float(np.abs(pert).max())
    e1 = float(np.abs(res.pyd - pyd_true).max())
    print("LM wall %.1fs cost %.3e -> %.3e err %.4f -> %.4f (%.1f%%)" %
          (wall, res.cost0, res.cost, e0, e1, 100 * e1 / e0), flush=True)

    try:
        from PIL import Image
        for name, p in [("target", pyd_true), ("start", pyd0),
                        ("recovered", res.pyd)]:
            img = np.asarray(render(jnp.asarray(p)))
            rgb = np.clip(img[:, :3].reshape(W, W, 3), 0, 1)
            Image.fromarray((rgb * 255).astype("uint8")).save(
                f"/tmp/pose_{name}.png")
    except Exception as e:  # pragma: no cover - png output is best-effort
        print("png skip:", e, flush=True)

    out = {
        "scene": "flagship_mlobb (trained)",
        "engine": "megakernel forward, jitted, real TPU",
        "resolution": W, "supersample": S, "stepsize": STEP,
        "pyd_true": [float(v) for v in pyd_true],
        "perturbation": [float(v) for v in pert],
        "recovered": [float(v) for v in res.pyd],
        "err0": e0, "err1": e1, "err_ratio": e1 / e0,
        "cost0": res.cost0, "cost1": res.cost,
        "iterations": res.iterations, "wall_s": wall,
    }
    with open(os.path.join(ROOT, "POSE_R04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
