"""Ensemble-generalization + time-dependent training tests
(reference: train_ensemble_generalization.py; BASELINE config 5 shape)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.train.generalization import (
    generalize_to_new_ensembles, latent_only_mask)
from fvsrn_tpu.train.losses import LossNetWorld
from fvsrn_tpu.train.optimizer import make_optimizer
from fvsrn_tpu.train.world import WorldDataset, make_train_step
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def _time_net(seed=0):
    rng = np.random.default_rng(seed)
    latent = LatentSpace(
        time_grid=(rng.standard_normal((2, 4, 8, 8, 8)) * 0.05)
        .astype(np.float32),
        ensemble_grid=(rng.standard_normal((3, 4, 8, 8, 8)) * 0.05)
        .astype(np.float32),
        time_dependent=True)
    return SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:1", num_fourier=4,
        output_mode="density:direct", latent=latent, seed=seed)


def _batch(vol_a, vol_b, n, time, rng):
    """Samples whose target switches with the time keyframe."""
    pos = rng.random((n, 3)).astype(np.float32)
    vol = vol_a if time < 0.5 else vol_b
    world = np.asarray(vol.box_min) + pos * np.asarray(vol.box_size)
    target = np.asarray(vol.eval_density(jnp.asarray(world))[0])[:, None]
    return WorldDataset(
        positions=jnp.asarray(pos), targets=jnp.asarray(target),
        tf=jnp.zeros(n), time=jnp.full((n,), time, jnp.float32),
        ensemble=jnp.zeros(n))


def test_time_dependent_training_fits_two_keyframes():
    """A time-keyframed latent grid lets ONE network represent two
    different volumes at t=0 and t=1 (BASELINE config 5's time-varying
    volumes)."""
    vol_a = VolumeInterpolationImplicit.make("SPHERE")
    vol_b = VolumeInterpolationImplicit.make("CUBE")
    net = _time_net()
    loss = LossNetWorld(mode="density", l1=1.0)
    opt = make_optimizer("Adam", lr=5e-3)
    step = jax.jit(make_train_step(loss, opt))
    opt_state = opt.init(net)
    rng = np.random.default_rng(1)
    b0 = _batch(vol_a, vol_b, 2048, 0.0, rng)
    b1 = _batch(vol_a, vol_b, 2048, 1.0, rng)
    first = last = None
    for i in range(60):
        net, opt_state, t0, _ = step(net, opt_state, b0)
        net, opt_state, t1, _ = step(net, opt_state, b1)
        if i == 0:
            first = float(t0) + float(t1)
        last = float(t0) + float(t1)
    assert last < 0.5 * first, (first, last)
    # the two keyframes produce different fields at the same position
    x = jnp.asarray(rng.random((64, 3)), jnp.float32)
    y0 = np.asarray(net(x, time=jnp.zeros(64)))
    y1 = np.asarray(net(x, time=jnp.ones(64)))
    assert np.abs(y0 - y1).max() > 0.05


def test_generalize_to_new_ensembles():
    net = _time_net()
    net2 = generalize_to_new_ensembles(net, 5, seed=3)
    assert net2.latent.ensemble_grid.shape[0] == 5
    # MLP weights untouched
    for a, b in zip(net.layers, net2.layers):
        np.testing.assert_array_equal(np.asarray(a.weight),
                                      np.asarray(b.weight))


def test_latent_only_mask_freezes_mlp():
    vol = VolumeInterpolationImplicit.make("SPHERE")
    net = _time_net()
    loss = LossNetWorld(mode="density", l1=1.0)
    opt = make_optimizer("Adam", lr=1e-2)
    step = jax.jit(make_train_step(loss, opt, trainable=latent_only_mask))
    rng = np.random.default_rng(2)
    b = _batch(vol, vol, 512, 0.0, rng)
    net2, _, _, _ = step(net, opt.init(net), b)
    for a, c in zip(net.layers, net2.layers):
        np.testing.assert_array_equal(np.asarray(a.weight),
                                      np.asarray(c.weight))
    assert not np.allclose(np.asarray(net.latent.time_grid),
                           np.asarray(net2.latent.time_grid))
