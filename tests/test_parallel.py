"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4:
single-host vs multi-host allclose equality of images and gradients)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from fvsrn_tpu.parallel.train_step import (
    make_dp_render, make_dp_world_train_step)
from fvsrn_tpu.train.losses import LossNetWorld
from fvsrn_tpu.train.optimizer import make_optimizer
from fvsrn_tpu.train.world import WorldDataset, make_train_step
from fvsrn_tpu.camera import CameraOnASphere, generate_rays
from fvsrn_tpu.raytracer.dvr import (
    RayEvaluationSteppingDvr, max_steps_bound, trace_dvr)
from fvsrn_tpu.transfer import TransferFunctionIdentity
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def _make_net(rng):
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((4, 8, 8, 8)) * 0.1).astype(np.float32)))
    return SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:2", num_fourier=4,
        output_mode="density:direct", latent=latent, seed=2)


def _make_batch(rng, n):
    return WorldDataset(
        positions=rng.random((n, 3)).astype(np.float32),
        targets=rng.random((n, 1)).astype(np.float32),
        tf=np.zeros((n,), np.float32),
        time=np.zeros((n,), np.float32),
        ensemble=np.zeros((n,), np.float32))


def test_dp_train_step_matches_single_device(rng):
    """The sharded step must produce the SAME updated params as the
    single-device step on the full batch."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    net = _make_net(rng)
    batch = _make_batch(rng, 128)
    loss = LossNetWorld(mode="density", l1=1.0)
    opt = make_optimizer("Adam", lr=1e-3)

    # single-device reference
    step1 = make_train_step(loss, opt)
    net1, _, total1, _ = step1(net, opt.init(net), batch)

    # sharded
    netr = replicate(mesh, net)
    optr = replicate(mesh, opt.init(netr))
    batchr = shard_batch(mesh, batch)
    stepN = make_dp_world_train_step(mesh, loss, opt)
    netN, _, totalN = stepN(netr, optr, batchr)

    np.testing.assert_allclose(float(total1), float(totalN), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(net1), jax.tree.leaves(netN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_render_matches_single_device(rng):
    """Ray-sharded rendering must equal the single-device image."""
    mesh = make_mesh(8)
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionIdentity.make(absorption=10.0)
    cfg = RayEvaluationSteppingDvr.make(stepsize=0.05,
                                        enable_early_out=False)
    cam = CameraOnASphere.make(distance=1.5)
    start, direction = generate_rays(cam, 16, 16)
    s = jnp.reshape(start, (-1, 3))
    d = jnp.reshape(direction, (-1, 3))
    steps = max_steps_bound(vol.box_size, 0.05)

    def render_rays(rs, rd, vol, tf, cfg):
        return trace_dvr(rs, rd, vol, tf, cfg, steps).color

    ref = np.asarray(render_rays(s, d, vol, tf, cfg))
    sharded = make_dp_render(mesh, render_rays)
    got = np.asarray(sharded(s, d, vol, tf, cfg))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_graft_entry_singlechip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    a = np.asarray(out)
    assert a.shape[-1] == 4
    assert np.isfinite(a).all()


def test_graft_entry_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_fused_render_matches_single(rng):
    """Ray-sharded FUSED kernel (interpret mode) equals the single-device
    fused render -- the sharding story for the perf path."""
    from fvsrn_tpu.ops.fused_dvr import fused_trace_dvr
    from fvsrn_tpu.models.latent import LatentSpace
    mesh = make_mesh(8)
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((8, 8, 8, 8)) * 0.2).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:1", num_fourier=4,
        output_mode="density:direct", latent=latent, seed=9)
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1.0, 0.3, 0.1], [0.3, 1.0, 0.5]], opacity=[0.0, 20.0],
        positions=[0.0, 1.0])
    cam = CameraOnASphere.make(pitch=0.2, yaw=0.9, distance=1.6)
    start, direction = generate_rays(cam, 32, 16)
    rs = jnp.reshape(start, (-1, 3))
    rd = jnp.reshape(direction, (-1, 3))

    def render_rays(rs, rd, net, tft):
        return fused_trace_dvr(
            rs, rd, net, (-0.5, -0.5, -0.5), (1.0, 1.0, 1.0), tft,
            stepsize=1 / 32, max_steps=56, seg=8, tile=32,
            enable_early_out=False, interpret=True)

    ref = np.asarray(render_rays(rs, rd, net, tf.tensor))
    sharded = make_dp_render(mesh, render_rays)
    got = np.asarray(sharded(rs, rd, net, tf.tensor))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_dp_screen_train_step_matches_single_device(rng):
    """Camera-sharded screen-space training step (BASELINE config 4)
    equals the single-device step on the full camera batch."""
    import optax
    from fvsrn_tpu.parallel.train_step import make_dp_screen_train_step
    from fvsrn_tpu.train.losses import LossNetScreen
    from fvsrn_tpu.train.screen import evaluate_screen
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear

    mesh = make_mesh(8)
    net = _make_net(rng)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1.0, 0.3, 0.1], [0.3, 1.0, 0.5]], opacity=[0.0, 20.0],
        positions=[0.0, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 16,
                                        enable_early_out=False)
    w = h = 8
    steps = max_steps_bound((1.0, 1.0, 1.0), 1 / 16)
    cams = [CameraOnASphere.make(pitch=0.1 * i, yaw=0.3 * i, distance=1.6)
            for i in range(8)]
    rs, rd, tgt = [], [], []
    for c in cams:
        s, d = generate_rays(c, w, h)
        rs.append(np.asarray(s).reshape(-1, 3))
        rd.append(np.asarray(d).reshape(-1, 3))
        tgt.append(rng.random((w * h, 4)).astype(np.float32))
    rs, rd, tgt = (np.stack(rs), np.stack(rd), np.stack(tgt))
    loss = LossNetScreen(l1=1.0, l2=0.5, dssim=0.25)
    opt = make_optimizer("Adam", lr=1e-3)

    # single-device reference step
    import jax
    @jax.jit
    def step1(net, opt_state, rs, rd, tgt):
        def loss_fn(n):
            total, _ = evaluate_screen(n, rs, rd, tgt, tf, cfg, loss,
                                       steps, w, h)
            return total
        total, grads = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = opt.update(grads, opt_state, net)
        return optax.apply_updates(net, updates), opt_state, total

    net1, _, total1 = step1(net, opt.init(net), rs, rd, tgt)

    netr = replicate(mesh, net)
    optr = replicate(mesh, opt.init(netr))
    shard = lambda a: shard_batch(mesh, a)
    stepN = make_dp_screen_train_step(mesh, tf, cfg, loss, opt,
                                      width=w, height=h, max_steps=steps)
    netN, _, totalN = stepN(netr, optr, shard(rs), shard(rd), shard(tgt))

    np.testing.assert_allclose(float(total1), float(totalN), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(net1), jax.tree.leaves(netN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cp_render_matches_single_device(rng):
    """Ray-SEGMENT (context-parallel) marching: 8 devices each march a
    disjoint span of the step axis; over-composition of the partials
    equals the single-device march exactly (associativity)."""
    from fvsrn_tpu.parallel.train_step import make_cp_render
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear
    mesh = make_mesh(8)
    vol = VolumeInterpolationImplicit.make("MARSCHNER_LOBB")
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1.0, 0.2, 0.1], [0.2, 0.4, 1.0]], opacity=[0.0, 25.0],
        positions=[0.0, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 48,
                                        enable_early_out=False)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.7, distance=1.6)
    start, direction = generate_rays(cam, 16, 16)
    s = jnp.reshape(start, (-1, 3))
    d = jnp.reshape(direction, (-1, 3))
    steps = max_steps_bound(vol.box_size, 1 / 48)

    ref = trace_dvr(s, d, vol, tf, cfg, steps)
    cp = make_cp_render(mesh, vol, tf, cfg, steps)
    got = cp(s, d)
    assert np.asarray(ref.color)[:, 3].max() > 0.5
    np.testing.assert_allclose(np.asarray(got.color),
                               np.asarray(ref.color), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.normal),
                               np.asarray(ref.normal), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.depth),
                               np.asarray(ref.depth), atol=2e-5)


def test_cp_render_rejects_early_out():
    import pytest
    from fvsrn_tpu.parallel.train_step import make_cp_render
    from fvsrn_tpu.transfer import TransferFunctionIdentity
    mesh = make_mesh(8)
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionIdentity.make(absorption=10.0)
    cfg = RayEvaluationSteppingDvr.make(stepsize=0.05)
    with pytest.raises(ValueError, match="early_out"):
        make_cp_render(mesh, vol, tf, cfg, 32)


def test_mc_sharded_matches_single_bitwise(rng):
    """Monte-Carlo eval sharded over rays equals the single-device
    trace: all draws are counter-based on (key, ray_id) (the per-thread
    cuRAND role, renderer_sampler_curand.cuh), so the PRNG streams are
    sharding-invariant; only 1-ULP elementwise rounding may differ
    between the shard-shaped and full-shaped XLA programs."""
    from jax.sharding import PartitionSpec as P
    from fvsrn_tpu.phase import PhaseFunctionHenyeyGreenstein
    from fvsrn_tpu.raytracer.montecarlo import (RayEvaluationMonteCarlo,
                                                trace_mc)
    from fvsrn_tpu.transfer import TransferFunctionIdentity
    mesh = make_mesh(8)
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionIdentity.make(absorption=8.0)
    cfg = RayEvaluationMonteCarlo.make(max_absorption=8.0,
                                       max_iterations=64, num_bounces=1)
    phase = PhaseFunctionHenyeyGreenstein.make(g=0.3)
    cam = CameraOnASphere.make(pitch=0.2, yaw=0.4, distance=1.5)
    start, direction = generate_rays(cam, 16, 16)
    rs = jnp.reshape(start, (-1, 3))
    rd = jnp.reshape(direction, (-1, 3))
    rid = jnp.arange(rs.shape[0], dtype=jnp.uint32)
    key = jax.random.PRNGKey(5)

    ref = trace_mc(key, rs, rd, vol, tf, phase, cfg, ray_id=rid)

    def local(rs, rd, rid):
        out = trace_mc(key, rs, rd, vol, tf, phase, cfg, ray_id=rid)
        return out.color

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    got = np.asarray(sharded(rs, rd, rid))
    np.testing.assert_allclose(got, np.asarray(ref.color), atol=2e-6)


def test_config5_time_varying_mc_endtoend(rng):
    """BASELINE config 5 end to end on the virtual mesh: a
    time/ensemble-keyframed SRN renders through the FUSED path at an
    interpolated time, and its Monte-Carlo path-traced eval runs
    rays-sharded over the mesh with sharding-invariant PRNG streams."""
    from jax.sharding import PartitionSpec as P
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.ops.fused_dvr import fused_trace_dvr
    from fvsrn_tpu.phase import PhaseFunctionRayleigh
    from fvsrn_tpu.raytracer.montecarlo import (RayEvaluationMonteCarlo,
                                                trace_mc)
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear
    mesh = make_mesh(8)
    latent = LatentSpace(
        time_dependent=True,
        time_grid=jnp.asarray((rng.standard_normal((3, 8, 8, 8, 8)) * 0.3)
                              .astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:2", num_fourier=4,
        output_mode="density:direct", latent=latent, seed=4)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.3, 0.2], [0.2, 0.6, 1.0]], opacity=[2.0, 15.0],
        positions=[0.0, 1.0])
    t = 1.3
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.9, distance=1.6)
    start, direction = generate_rays(cam, 16, 16)
    rs = jnp.reshape(start, (-1, 3))
    rd = jnp.reshape(direction, (-1, 3))

    # fused render of the time-conditioned SRN, rays-sharded
    def render_rays(rs, rd, net, tft):
        return fused_trace_dvr(
            rs, rd, net, (-0.5, -0.5, -0.5), (1.0, 1.0, 1.0), tft,
            stepsize=1 / 32, max_steps=56, seg=8, tile=32,
            enable_early_out=False, time=t, interpret=True)

    ref_img = np.asarray(render_rays(rs, rd, net, tf.tensor))
    sharded_render = make_dp_render(mesh, render_rays)
    got_img = np.asarray(sharded_render(rs, rd, net, tf.tensor))
    np.testing.assert_allclose(got_img, ref_img, atol=1e-5)
    assert ref_img[:, 3].max() > 0.1

    # MC path-traced eval of the same time-conditioned SRN, rays-sharded
    vol = VolumeInterpolationNetwork.make(net, time=t)
    cfg = RayEvaluationMonteCarlo.make(
        max_absorption=float(np.asarray(tf.max_absorption())),
        max_iterations=32, num_bounces=1)
    phase = PhaseFunctionRayleigh.make()
    rid = jnp.arange(rs.shape[0], dtype=jnp.uint32)
    key = jax.random.PRNGKey(11)
    ref_mc = np.asarray(trace_mc(key, rs, rd, vol, tf, phase, cfg,
                                 ray_id=rid).color)

    def local(rs, rd, rid):
        return trace_mc(key, rs, rd, vol, tf, phase, cfg,
                        ray_id=rid).color

    sharded_mc = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    got_mc = np.asarray(sharded_mc(rs, rd, rid))
    np.testing.assert_allclose(got_mc, ref_mc, atol=2e-6)
    assert np.isfinite(ref_mc).all()


def test_dp_screen_overlap_grads_equal():
    """overlap_grads=True (latent psum issued in the backward via
    _pmean_in_bwd) produces the SAME updated parameters as the trailing
    pmean -- the overlap spelling is a scheduling hint, not a semantics
    change."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fvsrn_tpu.camera import CameraOnASphere, generate_rays
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from fvsrn_tpu.parallel.train_step import make_dp_screen_train_step
    from fvsrn_tpu.raytracer.dvr import RayEvaluationSteppingDvr
    from fvsrn_tpu.train.losses import LossNetScreen
    from fvsrn_tpu.train.optimizer import make_optimizer
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear

    n = min(4, len(jax.devices()))
    mesh = make_mesh(n)
    rng = np.random.default_rng(0)
    latent = LatentSpace(static_grid=(
        rng.standard_normal((4, 8, 8, 8)) * 0.1).astype(np.float32))
    net = SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:2", num_fourier=4,
        output_mode="density:direct", latent=latent, seed=2)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1.0, 0.3, 0.1], [0.3, 1.0, 0.5]], opacity=[0.0, 20.0],
        positions=[0.0, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 16,
                                        enable_early_out=False)
    opt = make_optimizer("Adam", lr=1e-3)
    w = h = 8
    steps = 28
    rs, rd, tgt = [], [], []
    for i in range(n):
        s, d = generate_rays(
            CameraOnASphere.make(pitch=0.1 * i, yaw=0.4 * i,
                                 distance=1.6), w, h)
        rs.append(np.asarray(s).reshape(-1, 3))
        rd.append(np.asarray(d).reshape(-1, 3))
        tgt.append(rng.random((w * h, 4)).astype(np.float32))
    rs, rd, tgt = np.stack(rs), np.stack(rd), np.stack(tgt)
    sloss = LossNetScreen(l1=1.0, l2=0.5)
    nets = {}
    for overlap in (False, True):
        step = make_dp_screen_train_step(
            mesh, tf, cfg, sloss, opt, width=w, height=h,
            max_steps=steps, overlap_grads=overlap)
        net2, _, total = step(replicate(mesh, net),
                              replicate(mesh, opt.init(net)),
                              shard_batch(mesh, rs),
                              shard_batch(mesh, rd),
                              shard_batch(mesh, tgt))
        nets[overlap] = (float(total), net2)
    np.testing.assert_allclose(nets[True][0], nets[False][0],
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(nets[True][1]),
                    jax.tree.leaves(nets[False][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7)
