"""Capture a jax.profiler trace of the mega fwd and fwd+bwd flagship
frames and print the per-op duration breakdown (XLA ops vs the pallas
kernel) by parsing the xplane proto with tensorflow.

Usage: tools/tpurun.sh tools/profile_mega.py /tmp/profile_mega.log
"""
import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")

TRACE_DIR = "/tmp/mega_trace"


def capture():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _build_flagship
    from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,
                                  generate_rays)
    from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,
                                         fused_trace_dvr_bucketed,
                                         plan_ray_buckets)

    W = H = 512
    STEP = 1.0 / 512
    vol, tf, cfg = _build_flagship()
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    matrix = np.asarray(camera_matrix(cam))
    s, d = generate_rays(matrix, W, H, fov_y_radians=0.7853981633974483)
    rs_np = np.asarray(s).reshape(-1, 3)
    rd_np = np.asarray(d).reshape(-1, 3)
    perm, _ = block_ray_permutation(W, H, 16, 16)
    rs_np, rd_np = rs_np[perm], rd_np[perm]
    bm = np.asarray(vol.box_min)
    bs = np.asarray(vol.box_size)
    rs = jnp.asarray(rs_np)
    rd = jnp.asarray(rd_np)
    net = vol.network
    plan = plan_ray_buckets(rs_np, rd_np, bm, bs, stepsize=STEP,
                            seg=32, tile=256, n_buckets=3,
                            grid_sizes=(32, 32, 32))

    @jax.jit
    def fwd(net, tft):
        return fused_trace_dvr_bucketed(
            rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
            seg=32, tile=256, enable_early_out=True,
            differentiable=False, latent_mode="boxfeat",
            table_dtype=jnp.bfloat16, engine="mega")

    @jax.jit
    def fb(net, tft):
        def loss_fn(n, t):
            c = fused_trace_dvr_bucketed(
                rs, rd, n, bm, bs, t, plan=plan, stepsize=STEP,
                seg=32, tile=256, enable_early_out=False,
                differentiable=True, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16, engine="mega")
            return jnp.mean(c ** 2)
        return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

    _ = float(jnp.sum(fwd(net, tf.tensor)))
    r = fb(net, tf.tensor)
    _ = float(r[0])
    with jax.profiler.trace(TRACE_DIR):
        for _i in range(2):
            _ = float(jnp.sum(fwd(net, tf.tensor)))
        for _i in range(2):
            r = fb(net, tf.tensor)
            _ = float(r[0])
    print("trace captured", flush=True)


def analyze():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(os.path.join(
        TRACE_DIR, "plugins/profile/*/*.xplane.pb"))
    assert files, "no xplane found"
    path = max(files, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"== plane: {plane.name}", flush=True)
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e12
                cnt[name] += 1
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
        for name, t in top:
            print(f"  {t*1000:9.2f} ms  x{cnt[name]:<5d} {name[:100]}",
                  flush=True)


if __name__ == "__main__":
    capture()
    analyze()
