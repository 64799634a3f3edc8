"""Fused SRN sample evaluator (ops/fused_eval) vs the plain oracle.

The reference's verification pattern for the in-kernel MLP is a
libtorch reimplementation compared elementwise
(unittests/testSRN.cpp:327-431); here the oracle is
``VolumeInterpolationNetwork.eval_density`` / ``eval_normal`` (plain
JAX), and the MC integration oracle is ``trace_mc`` without a sampler
on the SAME PRNG streams.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.ops.fused_eval import make_fused_eval
from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear


def _net(with_latent=True, seed=11, direction=False):
    rng = np.random.default_rng(seed)
    latent = LatentSpace()
    if with_latent:
        latent = LatentSpace(static_grid=jnp.asarray(
            (rng.standard_normal((8, 8, 8, 8)) * 0.3).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=6,
        output_mode="density:direct", latent=latent, seed=seed,
        use_direction=direction)
    return net


def _positions(n, seed=0, spill=0.2):
    rng = np.random.default_rng(seed)
    # include out-of-box positions: the inside mask must match too
    return (rng.random((n, 3)).astype(np.float32)
            * (1 + 2 * spill) - (0.5 + spill))


@pytest.mark.parametrize("with_latent", [False, True])
def test_fused_eval_matches_plain(with_latent):
    net = _net(with_latent)
    vol = VolumeInterpolationNetwork.make(net)
    pos = jnp.asarray(_positions(500))
    ev = make_fused_eval(net, vol.box_min, vol.box_size, tile=128,
                         interpret=True)
    v_f, in_f = ev(pos)
    v_p, in_p = vol.eval_density(pos)
    np.testing.assert_array_equal(np.asarray(in_f), np.asarray(in_p))
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_p),
                               atol=2e-5)


def test_fused_eval_direction_input():
    net = _net(True, direction=True)
    vol = VolumeInterpolationNetwork.make(net)
    pos = jnp.asarray(_positions(300, seed=3))
    rng = np.random.default_rng(4)
    d = rng.standard_normal((300, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    ev = make_fused_eval(net, vol.box_min, vol.box_size, tile=128,
                         interpret=True)
    v_f, _ = ev(pos, d)
    v_p, _ = vol.eval_density(pos, d)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_p),
                               atol=2e-5)


def test_fused_eval_gradient_matches_adjoint():
    """want_grad: the in-kernel position-gradient sweep vs jax.grad of
    the plain density (the evaluator analog of the fused-normals DVR
    oracle test)."""
    net = _net(True, seed=17)
    vol = VolumeInterpolationNetwork.make(net)
    # interior positions only (the clamp's subgradient at the box face
    # differs between AD and the analytic stencil by convention)
    rng = np.random.default_rng(5)
    pos = jnp.asarray((rng.random((256, 3)) * 0.9 - 0.45)
                      .astype(np.float32))
    ev = make_fused_eval(net, vol.box_min, vol.box_size, tile=128,
                         want_grad=True, interpret=True)
    v_f, _, g_f = ev(pos)
    v_p, _ = vol.eval_density(pos)
    g_p = vol.eval_normal(pos)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_p),
                               atol=2e-5)
    # the clip derivative zeroes saturated samples in both paths
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_p),
                               atol=5e-4, rtol=1e-3)


def test_trace_mc_fused_matches_plain_oracle():
    """BASELINE config 5's MC arm through the fused sampler: same PRNG
    streams -> same walk decisions (knife-edge acceptance flips from the
    kernel's ~1e-6 polynomial trig are tolerated as a tiny fraction)."""
    from fvsrn_tpu.phase import PhaseFunctionHenyeyGreenstein
    from fvsrn_tpu.raytracer.montecarlo import (RayEvaluationMonteCarlo,
                                                trace_mc)
    from fvsrn_tpu.camera import CameraOnASphere, generate_rays

    net = _net(True, seed=23)
    vol = VolumeInterpolationNetwork.make(net)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.2, 0.1], [0.2, 0.9, 0.5]], opacity=[0.0, 12.0],
        positions=[0.0, 1.0])
    phase = PhaseFunctionHenyeyGreenstein.make(g=0.3)
    config = RayEvaluationMonteCarlo.make(
        max_absorption=12.0, num_bounces=1, max_iterations=64)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.8, distance=1.6)
    s, d = generate_rays(cam, 16, 16)
    rs = jnp.reshape(s, (-1, 3))
    rd = jnp.reshape(d, (-1, 3))
    key = jax.random.PRNGKey(42)
    out_p = trace_mc(key, rs, rd, vol, tf, phase, config)
    out_f = trace_mc(key, rs, rd, vol, tf, phase, config,
                     use_fused=True,
                     fused_kwargs=dict(tile=128, interpret=True))
    a = np.asarray(out_p.color)
    b = np.asarray(out_f.color)
    close = np.all(np.abs(a - b) < 1e-3, axis=-1)
    assert close.mean() > 0.98, f"{(~close).sum()} rays diverged"
    np.testing.assert_allclose(b[close], a[close], atol=1e-3)


def test_delta_tracking_chunk_invariant():
    """steps_per_round is a pure performance knob: draws are a function
    of (key, ray_id, step index), so K=4 reproduces the K=1 walk
    bitwise."""
    from fvsrn_tpu.raytracer.montecarlo import (RayEvaluationMonteCarlo,
                                                delta_tracking)
    from fvsrn_tpu.camera import CameraOnASphere, generate_rays

    net = _net(True, seed=29)
    vol = VolumeInterpolationNetwork.make(net)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.2, 0.1], [0.2, 0.9, 0.5]], opacity=[0.0, 15.0],
        positions=[0.0, 1.0])
    config = RayEvaluationMonteCarlo.make(max_absorption=15.0,
                                          max_iterations=64)
    cam = CameraOnASphere.make(pitch=0.2, yaw=0.5, distance=1.5)
    s, d = generate_rays(cam, 8, 8)
    rs = jnp.reshape(s, (-1, 3))
    rd = jnp.reshape(d, (-1, 3))
    key = jax.random.PRNGKey(3)
    r1 = delta_tracking(key, rs, rd, vol, tf, config,
                        steps_per_round=1)
    r4 = delta_tracking(key, rs, rd, vol, tf, config,
                        steps_per_round=4)
    for a, b in zip(r1, r4):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
