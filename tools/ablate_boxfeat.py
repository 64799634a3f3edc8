"""TPU ablation of the boxfeat forward, single process (env var read at
trace time; fresh jit wrappers per variant retrace).

Run: tools/tpurun.sh tools/ablate_boxfeat.py /tmp/ablate_boxfeat.log
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from __graft_entry__ import _build_flagship
from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation, certify_boxfeat,
                                     fused_trace_dvr)
from fvsrn_tpu.raytracer.dvr import max_steps_bound

W = H = 512
STEP = 1.0 / 512

vol, tf, _ = _build_flagship()
steps = max_steps_bound(vol.box_size, STEP)
mat = np.asarray(camera_matrix(
    CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)))


@jax.jit
def mk(m):
    s, d = generate_rays(m, W, H, fov_y_radians=0.7853981633974483)
    return s.reshape(-1, 3), d.reshape(-1, 3)


rs, rd = mk(mat)
rs = np.asarray(rs)
rd = np.asarray(rd)
perm, inv = block_ray_permutation(W, H, 16, 16)
rs, rd = rs[perm], rd[perm]
bm = np.asarray(vol.box_min)
bs = np.asarray(vol.box_size)
spec = certify_boxfeat(rs, rd, (32, 32, 32), bm, bs, stepsize=STEP,
                       max_steps=steps, seg=32, tile=256)
print("spec:", spec, flush=True)
net_nolat = SceneRepresentationNetwork.make(
    layers="32:32:32", activation="SnakeAlt:2", num_fourier=14,
    output_mode="density:direct", latent=LatentSpace(), seed=1)


def timeit(f, *args, reps=5):
    np.asarray(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_fwd(mode, sp):
    @jax.jit
    def fwd(net, tft, rs, rd):
        return fused_trace_dvr(
            rs, rd, net, bm, bs, tft, stepsize=STEP, max_steps=steps,
            seg=32, tile=256, enable_early_out=True, latent_mode=mode,
            table_dtype=jnp.bfloat16, subbox=sp)
    return fwd


for name, ablate, nolat in [("full", "", False),
                            ("full-again", "", False),
                            ("bf16", "bf16", False),
                            ("noresolve", "noresolve", False),
                            ("nolatentmath", "nolatentmath", False),
                            ("nolat-floor", "", True)]:
    if ablate:
        os.environ["FV_BF_ABLATE"] = ablate
    else:
        os.environ.pop("FV_BF_ABLATE", None)
    if nolat:
        f = make_fwd("table", 0)
        t = timeit(f, net_nolat, tf.tensor, jnp.asarray(rs),
                   jnp.asarray(rd))
    else:
        f = make_fwd("boxfeat", spec)
        t = timeit(f, vol.network, tf.tensor, jnp.asarray(rs),
                   jnp.asarray(rd))
    print(f"{name}: {t:.4f}s = {W*H/t/1e6:.3f} Mrays/s", flush=True)
