#!/usr/bin/env python
"""Diagnose test_mega_camera_pose_optimization: print the pose-loss
trajectory for (a) the plain lattice oracle and (b) the megakernel,
same setup -- if BOTH bounce, the test's optimizer tuning fights the
documented lattice staircase; if only (b) does, the fused ray/camera
gradients or the stale footprint certificate are at fault.

RESOLVED (round 4): both trajectories bounce -- Adam on pose diverges
even with exact oracle gradients (weak-yaw observability + per-param
step scaling). The product recipe is Levenberg-Marquardt with fixed
supersampling jitter (fvsrn_tpu/train/pose.py; PERF.md round-4); the
retired test is replaced by test_mega_camera_pose_recovery +
tests/test_pose.py, and tools/pose_recovery_demo.py records full
convergence on the real TPU (POSE_R04.json). Kept as the diagnostic
that produced that conclusion."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
sys.path.insert(0, os.path.join(root, "tests"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from test_fused import _plain_lattice, _scene
from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,
                              generate_rays)
from fvsrn_tpu.ops.fused_dvr import certify_boxfeat
from fvsrn_tpu.ops.fused_mega import mega_trace_dvr
from fvsrn_tpu.raytracer.dvr import max_steps_bound

net, tf, _rs, _rd = _scene(True, seed=31)
stepsize = 1 / 32
steps = max_steps_bound((1.0, 1.0, 1.0), stepsize)
bm, bs = (-0.5, -0.5, -0.5), (1.0, 1.0, 1.0)
fov = 0.7853981633974483
m_true = jnp.asarray(camera_matrix(
    CameraOnASphere.make(pitch=0.3, yaw=0.7, distance=1.6)))
m0 = m_true + 0.05 * jax.random.normal(jax.random.PRNGKey(0),
                                       m_true.shape)
s0, d0 = generate_rays(np.asarray(m0), 8, 8, fov_y_radians=fov)
spec = certify_boxfeat(
    np.asarray(s0).reshape(-1, 3), np.asarray(d0).reshape(-1, 3),
    (8, 8, 8), bm, bs, stepsize=stepsize, max_steps=steps,
    seg=16, tile=64, margin=4)


def render_mega(m, sp):
    s, d = generate_rays(m, 8, 8, fov_y_radians=fov)
    return mega_trace_dvr(
        s.reshape(-1, 3), d.reshape(-1, 3), net, bm, bs, tf.tensor,
        stepsize=stepsize, max_steps=steps, seg=16, tile=64,
        enable_early_out=False, differentiable=True,
        ray_grads=True, subbox=sp, interpret=True)


def render_plain(m):
    s, d = generate_rays(m, 8, 8, fov_y_radians=fov)
    return _plain_lattice(net, tf, s.reshape(-1, 3),
                          d.reshape(-1, 3), stepsize, steps,
                          False).color


for name, render in (("plain", render_plain),
                     ("mega", lambda m: render_mega(m, spec))):
    target = jax.lax.stop_gradient(render(m_true))

    def loss(m):
        return jnp.mean((render(m) - target) ** 2)

    opt = optax.adam(3e-3)
    state = opt.init(m0)
    m = m0
    grad_fn = jax.value_and_grad(loss)
    traj = [float(loss(m0))]
    for i in range(30):
        l, g = grad_fn(m)
        upd, state = opt.update(g, state)
        m = optax.apply_updates(m, upd)
        traj.append(float(l))
    traj.append(float(loss(m)))
    err0 = float(jnp.abs(m0 - m_true).max())
    err1 = float(jnp.abs(m - m_true).max())
    print(f"{name}: l0={traj[0]:.5f} l_final={traj[-1]:.5f} "
          f"pose_err {err0:.4f}->{err1:.4f}")
    print("  traj:", " ".join(f"{v:.4f}" for v in traj))
