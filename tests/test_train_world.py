"""World-space training tests: the SRN must actually fit a volume
(reference: BASELINE config 2; training loop semantics from
applications/volnet/train_volnet.py:225-353)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.train.losses import LossNetWorld, dssim, l1_loss, ssim
from fvsrn_tpu.train.optimizer import make_optimizer, step_lr
from fvsrn_tpu.train.sampling import (
    get_sampled_positions, halton_positions, plastic_positions)
from fvsrn_tpu.train.world import (
    WorldDataset, build_world_dataset, train_world_epochs)
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def test_samplers_in_unit_cube():
    for sampler in ("random", "plastic", "halton"):
        p = get_sampled_positions(sampler, 256, 3)
        assert p.shape == (256, 3)
        assert (p >= 0).all() and (p < 1).all()
    # deterministic by start index
    a = plastic_positions(10, 3, start_index=5)
    b = plastic_positions(15, 3, start_index=0)[5:]
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_halton_low_discrepancy():
    p = halton_positions(512, 2)
    # mean close to 0.5 (much closer than random noise would guarantee)
    np.testing.assert_allclose(p.mean(axis=0), 0.5, atol=0.05)


def test_step_lr_schedule():
    s = step_lr(0.01, lr_step=2, lr_gamma=0.5, steps_per_epoch=10)
    assert s(0) == 0.01
    assert s(19) == 0.01
    assert abs(s(20) - 0.005) < 1e-9
    assert abs(s(40) - 0.0025) < 1e-9


def test_build_world_dataset_density():
    vol = VolumeInterpolationImplicit.make("SPHERE")
    ds = build_world_dataset(vol, 128, sampler="halton")
    assert ds.positions.shape == (128, 3)
    assert ds.targets.shape == (128, 1)
    # spot-check one target: density at center of unit cube = sphere value 1
    ds2 = build_world_dataset(vol, 1, positions=np.asarray([[0.5, 0.5, 0.5]],
                                                           np.float32))
    np.testing.assert_allclose(np.asarray(ds2.targets)[0, 0], 1.0, atol=1e-5)


def test_world_training_fits_sphere():
    """A small SRN fit on the sphere must drive L1 well below the trivial
    predictor's error."""
    vol = VolumeInterpolationImplicit.make("SPHERE")
    ds = build_world_dataset(vol, 4096, sampler="halton")
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:1", num_fourier=8,
        fourier_std=1.0, output_mode="density:direct", seed=3)
    loss = LossNetWorld(mode="density", l1=1.0)
    opt = make_optimizer("Adam", lr=5e-3, lr_step=100, lr_gamma=0.5)
    net2, history = train_world_epochs(
        net, ds, loss, opt, batch_size=512, epochs=30)
    # trivial predictor (mean density) has L1 ~ mean abs deviation
    targets = np.asarray(ds.targets)
    trivial = np.abs(targets - targets.mean()).mean()
    assert history[-1] < 0.5 * trivial, (history[0], history[-1], trivial)
    assert history[-1] < history[0]


def test_world_training_with_latent_grid():
    vol = VolumeInterpolationImplicit.make("MARSCHNER_LOBB")
    ds = build_world_dataset(vol, 2048, sampler="plastic")
    rng = np.random.default_rng(0)
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((4, 8, 8, 8)) * 0.1).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:2", num_fourier=4,
        output_mode="density:direct", latent=latent, seed=5)
    loss = LossNetWorld(mode="density", l1=1.0)
    opt = make_optimizer("Adam", lr=5e-3, lr_step=100, lr_gamma=0.5)
    net2, history = train_world_epochs(
        net, ds, loss, opt, batch_size=256, epochs=10)
    assert history[-1] < history[0]
    # latent grid moved
    assert not np.allclose(np.asarray(net.latent.static_grid),
                           np.asarray(net2.latent.static_grid))


def test_ssim_sanity(rng):
    a = jnp.asarray(rng.random((1, 4, 32, 32)), jnp.float32)
    np.testing.assert_allclose(float(ssim(a, a)), 1.0, atol=1e-5)
    b = jnp.asarray(rng.random((1, 4, 32, 32)), jnp.float32)
    assert float(ssim(a, b)) < 0.5
    # ssim of unrelated noise can be slightly negative -> dssim slightly
    # above 0.5
    assert 0.25 < float(dssim(a, b)) <= 0.6
