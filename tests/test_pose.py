"""Camera pose recovery (fvsrn_tpu.train.pose).

The reference's differentiable camera (renderer/camera.h:15-225
``Parameter<double3>``, applications/volnet/raytracing.py screen-space
backward) exists to let image losses drive camera parameters. These
tests pin the TPU build's product recipe for that use case:
Levenberg-Marquardt over the 3-DOF sphere parametrization with fixed
supersampling jitter (see fvsrn_tpu/train/pose.py for the round-4
measurement campaign that selected it over first-order optimizers).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                     max_steps_bound, trace_dvr)
from fvsrn_tpu.train.pose import PoseResult, make_pose_render, recover_pose

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_fused import _scene  # noqa: E402

FOV = 0.7853981633974483
PYD_TRUE = np.asarray([0.3, 0.7, 1.6], np.float32)


def _oracle_render_rays(net, tf, stepsize):
    steps = max_steps_bound((1.0, 1.0, 1.0), stepsize)
    vol = VolumeInterpolationNetwork.make(net)
    cfg = RayEvaluationSteppingDvr.make(stepsize=stepsize,
                                        enable_early_out=False)

    def render_rays(s, d):
        return trace_dvr(s, d, vol, tf, cfg, steps, lattice=True).color

    return render_rays


def test_pose_recovery_oracle_converges():
    """LM + supersampling recovers a perturbed camera pose to a few
    percent of the initial error on the plain lattice oracle (the
    recipe whose ablations -- Adam diverging, aliasing floors --
    are recorded in train/pose.py)."""
    net, tf, _rs, _rd = _scene(True, seed=31)
    stepsize = 1 / 32
    render = make_pose_render(
        jax.jit(_oracle_render_rays(net, tf, stepsize)), 16, 16,
        fov_y_radians=FOV, supersample=4)
    target = render(jnp.asarray(PYD_TRUE))
    pert = np.asarray([-0.04, 0.05, -0.03], np.float32)
    pyd0 = PYD_TRUE + pert
    res = recover_pose(render, target, pyd0, iterations=12)
    e0 = float(np.abs(pert).max())
    e1 = float(np.abs(res.pyd - PYD_TRUE).max())
    # measured: err 0.050 -> 0.006, cost -> ~0.3% of initial
    assert res.cost < 0.05 * res.cost0, (res.cost0, res.cost)
    assert e1 < 0.35 * e0, (e0, e1)


def test_pose_recovery_monotone_and_fixed_point():
    """The LM iteration is monotone by construction, and the true pose
    is an exact fixed point (cost 0 stays 0 -- target and render share
    one fixed-jitter estimator)."""
    net, tf, _rs, _rd = _scene(True, seed=31)
    render = make_pose_render(
        jax.jit(_oracle_render_rays(net, tf, 1 / 16)), 8, 8,
        fov_y_radians=FOV, supersample=2)
    target = render(jnp.asarray(PYD_TRUE))
    res = recover_pose(render, target,
                       PYD_TRUE + np.asarray([0.02, -0.02, 0.01]),
                       iterations=4)
    assert all(b <= a + 1e-12 for a, b in zip(res.costs, res.costs[1:]))
    res0 = recover_pose(render, target, PYD_TRUE, iterations=2)
    assert res0.cost0 < 1e-10
    np.testing.assert_allclose(res0.pyd, PYD_TRUE, atol=1e-6)
