"""Importance sampling tests (reference: renderer/volume_interpolation.cpp
importanceSampling kernels; training_data.py adaptive rebuild)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvsrn_tpu.train.importance import (
    importance_sampling, importance_sampling_with_probability_grid,
    loss_probability_grid)
from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def test_importance_sampling_density_biased():
    """Samples must concentrate where the density is high (sphere
    center)."""
    vol = VolumeInterpolationImplicit.make("SPHERE")
    key = jax.random.PRNGKey(0)
    pos, den, col = importance_sampling(key, vol, 2048, min_prob=0.01)
    assert pos.shape == (2048, 3)
    assert den.shape == (2048, 1)
    assert col is None
    # distance from center of unit cube: importance-sampled positions are
    # closer on average than uniform ones
    d_imp = np.linalg.norm(np.asarray(pos) - 0.5, axis=1).mean()
    uni = jax.random.uniform(jax.random.PRNGKey(1), (2048, 3))
    d_uni = np.linalg.norm(np.asarray(uni) - 0.5, axis=1).mean()
    assert d_imp < d_uni - 0.02
    # densities match volume evaluation
    world = np.asarray(vol.box_min) + np.asarray(pos) \
        * np.asarray(vol.box_size)
    ref, _ = vol.eval_density(jnp.asarray(world))
    np.testing.assert_allclose(np.asarray(den)[:, 0], np.asarray(ref),
                               atol=1e-5)


def test_importance_sampling_with_tf():
    vol = VolumeInterpolationImplicit.make("SPHERE")
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1, 0, 0], [0, 1, 0]], opacity=[0.0, 10.0],
        positions=[0.0, 1.0])
    pos, den, col = importance_sampling(
        jax.random.PRNGKey(2), vol, 512, tf=tf, min_prob=0.02)
    assert col.shape == (512, 4)


def test_probability_grid_sampling():
    """With a grid concentrated in one octant, samples land there."""
    vol = VolumeInterpolationImplicit.make("SPHERE")
    grid = np.full((8, 8, 8), 1e-3, np.float32)
    grid[:4, :4, :4] = 1.0  # low-corner octant
    pos, den, col = importance_sampling_with_probability_grid(
        jax.random.PRNGKey(3), vol, grid, 1024, min_prob=0.0005)
    frac_in_octant = float(np.mean(np.all(np.asarray(pos) < 0.55,
                                          axis=1)))
    assert frac_in_octant > 0.8


def test_loss_probability_grid():
    """The loss grid between two different volumes is largest where they
    disagree."""
    a = VolumeInterpolationImplicit.make("SPHERE")
    b = VolumeInterpolationImplicit.make("CUBE")
    g = np.asarray(loss_probability_grid(a, b, resolution=16))
    assert g.shape == (16, 16, 16)
    assert g.max() > 0.05
    same = np.asarray(loss_probability_grid(a, a, resolution=8))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
