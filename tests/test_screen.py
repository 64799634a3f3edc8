"""Screen-space training tests (reference: BASELINE config 4; semantics
from applications/volnet/evaluation.py + training_data.py screen mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.raytracer.dvr import RayEvaluationSteppingDvr
from fvsrn_tpu.train.losses import LossNetScreen
from fvsrn_tpu.train.optimizer import make_optimizer
from fvsrn_tpu.train.screen import build_screen_dataset, train_screen
from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def _setup():
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.4, 0.1], [0.9, 0.9, 0.3]],
        opacity=[0.0, 20.0], positions=[0.0, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 24,
                                        enable_early_out=False)
    return vol, tf, cfg


def test_build_screen_dataset():
    vol, tf, cfg = _setup()
    ds = build_screen_dataset(vol, tf, cfg, num_cameras=3, width=16,
                              height=16)
    assert ds.ray_start.shape == (3, 256, 3)
    assert ds.targets.shape == (3, 256, 4)
    a = np.asarray(ds.targets)
    assert np.isfinite(a).all()
    assert a[..., 3].max() > 0.5  # sphere visible from every camera


def test_screen_training_reduces_loss():
    vol, tf, cfg = _setup()
    ds = build_screen_dataset(vol, tf, cfg, num_cameras=4, width=16,
                              height=16)
    # sigmoid output: 'density:direct' clamps to [0,1] in screen mode and
    # an untrained net can saturate the clamp (zero gradient everywhere)
    net = SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:1", num_fourier=4,
        output_mode="density", seed=11)
    loss = LossNetScreen(l1=1.0, l2=1.0)
    opt = make_optimizer("Adam", lr=5e-3, lr_step=1000, lr_gamma=0.5)
    net2, hist = train_screen(net, ds, tf, cfg, loss, opt, epochs=12,
                              cameras_per_batch=2)
    assert hist[-1] < hist[0]
    assert hist[-1] < 0.8 * hist[0], hist


def test_screen_loss_multiply_alpha(rng):
    loss = LossNetScreen(l1=1.0, multiply_alpha=True)
    pred = jnp.asarray(rng.random((1, 4, 8, 8)), jnp.float32)
    ref = jnp.asarray(rng.random((1, 4, 8, 8)), jnp.float32)
    total, vals = loss(pred, ref, return_individual=True)
    assert np.isfinite(float(total))
    # where reference alpha is zero, rgb differences are ignored
    ref0 = ref.at[:, 3].set(0.0)
    pred_a = pred.at[:, :3].set(0.0)
    pred_b = pred.at[:, :3].set(1.0)
    la = float(loss(pred_a, ref0))
    lb = float(loss(pred_b, ref0))
    np.testing.assert_allclose(la, lb, atol=1e-6)


def test_train_screen_dp_loss_drops():
    """DP screen training (camera-sharded epoch loop, BASELINE config 4)
    fits and the loss drops; runs through the train CLI flag."""
    import tempfile
    from fvsrn_tpu.train.main import run
    from fvsrn_tpu.eval.sweep import default_options
    opt = default_options("IMPLICIT:SPHERE",
                          tempfile.mktemp(suffix=".hdf5"))
    opt.update(mode="screen", screen_cameras=8, screen_size=16,
               epochs=3, data_parallel=8, lr=5e-3,
               volumetric_features_channels=0,
               volumetric_features_resolution=0)
    result = run(opt)
    h = result["history"]
    assert len(h) == 3 and h[-1] < h[0]


def test_screen_training_mega_engine():
    """Screen training through the MEGAKERNEL engine under jit: the
    footprint certificate + pixel-block permutation are precomputed
    once (screen_mega_kwargs); the jitted step consumes only the static
    spec. Checks the mega forward equals the lattice-mode plain render
    through evaluate_screen, and that training reduces the loss."""
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.train.screen import evaluate_screen, screen_mega_kwargs

    vol, tf, cfg = _setup()
    ds = build_screen_dataset(vol, tf, cfg, num_cameras=3, width=32,
                              height=32)
    rng = np.random.default_rng(4)
    latent = LatentSpace(static_grid=(
        rng.standard_normal((4, 8, 8, 8)) * 0.1).astype(np.float32))
    net = SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:1", num_fourier=4,
        output_mode="density", latent=latent, seed=11)
    loss = LossNetScreen(l1=1.0, l2=1.0)
    steps = 48
    fk = screen_mega_kwargs(ds, net, stepsize=float(cfg.stepsize),
                            max_steps=steps, seg=8, tile=64,
                            interpret=True)

    # forward parity vs the plain path in lattice mode (the megakernel's
    # sampling convention), early-out off on both sides
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.raytracer.dvr import trace_dvr
    fk_ng = dict(fk, enable_early_out=False)
    total_mega, _ = evaluate_screen(
        net, ds.ray_start[:1], ds.ray_dir[:1], ds.targets[:1], tf, cfg,
        loss, steps, 32, 32, use_fused=True, fused_kwargs=fk_ng)
    netvol = VolumeInterpolationNetwork.make(net)
    out = trace_dvr(ds.ray_start[0], ds.ray_dir[0], netvol, tf,
                    cfg, steps, lattice=True).color
    pred = jnp.moveaxis(out.reshape(1, 32, 32, 4), -1, 1)
    ref = jnp.moveaxis(ds.targets[:1].reshape(1, 32, 32, 4), -1, 1)
    total_plain = loss(pred, ref)
    np.testing.assert_allclose(float(total_mega), float(total_plain),
                               rtol=1e-4)

    opt = make_optimizer("Adam", lr=5e-3, lr_step=1000, lr_gamma=0.5)
    net2, hist = train_screen(net, ds, tf, cfg, loss, opt, epochs=6,
                              cameras_per_batch=1, max_steps=steps,
                              use_fused=True, fused_kwargs=fk)
    assert hist[-1] < hist[0], hist


def test_screen_training_fused_texture_and_rgbo():
    """Round-4: screen training routes texture TFs AND rgbo nets
    through the fused backward end-to-end (evaluate_screen derives the
    kernel's tf_mode from the TF object; reference: raytracing.py's
    _predict dispatch) -- the loss drops in both configs."""
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.train.screen import evaluate_screen, screen_mega_kwargs
    from fvsrn_tpu.transfer import TransferFunctionTexture

    vol, _tf, cfg = _setup()
    rng = np.random.default_rng(9)
    tbl = rng.random((32, 4)).astype(np.float32)
    tbl[:, 3] *= 15.0
    tf = TransferFunctionTexture(tensor=jnp.asarray(tbl))
    ds = build_screen_dataset(vol, tf, cfg, num_cameras=2, width=32,
                              height=32)
    steps = 48
    for output_mode in ("density", "rgbo"):
        latent = LatentSpace(static_grid=(
            rng.standard_normal((4, 8, 8, 8)) * 0.1).astype(np.float32))
        net = SceneRepresentationNetwork.make(
            layers="16:16", activation="SnakeAlt:1", num_fourier=4,
            output_mode=output_mode, latent=latent, seed=12)
        loss = LossNetScreen(l1=1.0)
        fk = screen_mega_kwargs(ds, net, stepsize=float(cfg.stepsize),
                                max_steps=steps, seg=8, tile=64,
                                interpret=True)
        fk["enable_early_out"] = False
        opt = make_optimizer("Adam", lr=5e-3, lr_step=1000,
                             lr_gamma=0.5)
        net2, hist = train_screen(net, ds, tf, cfg, loss, opt,
                                  epochs=5, cameras_per_batch=1,
                                  max_steps=steps, use_fused=True,
                                  fused_kwargs=fk)
        assert hist[-1] < hist[0], (output_mode, hist)
