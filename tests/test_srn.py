"""SRN model tests: torch oracles for latent interpolation, layout checks
for the fourier parametrization, and a world-space fit (the reference's
load-bearing test pattern is cross-implementation consistency,
unittests/testSRN.cpp:327-431)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fvsrn_tpu.models.activations import apply_activation, parse_activation
from fvsrn_tpu.models.latent import (
    LatentSpace, grid_sample_3d, interp1d, keyframe_grid_sample)
from fvsrn_tpu.models.srn import (
    InputParametrization, Layer, SceneRepresentationNetwork)


def test_activations_match_formulas(rng):
    x = rng.standard_normal(100).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(
        np.asarray(apply_activation("Snake", xj, 2.0)),
        x + np.sin(2 * x) ** 2 / 2.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(apply_activation("SnakeAlt", xj, 2.0)),
        (x + 1 - np.cos(4 * x)) / 4.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(apply_activation("Sine", xj, 30.0)),
        np.sin(30 * x), atol=1e-4)
    assert parse_activation("SnakeAlt:2") == ("SnakeAlt", 2.0)
    assert parse_activation("ReLU") == ("ReLU", 1.0)


def test_interp1d_matches_loop(rng):
    fp = rng.random((2, 3, 5)).astype(np.float32)
    x = (rng.random((2, 7)) * 6 - 1).astype(np.float32)  # incl. clamping
    got = np.asarray(interp1d(jnp.asarray(fp), jnp.asarray(x)))
    for b in range(2):
        for m in range(7):
            xv = np.clip(x[b, m], 0, 4)
            i0 = min(int(np.floor(xv)), 3)
            f = xv - i0
            expect = fp[b, :, i0] * (1 - f) + fp[b, :, i0 + 1] * f
            np.testing.assert_allclose(got[b, :, m], expect, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    grid = rng.random((1, 4, 5, 6, 7)).astype(np.float32)  # (1,C,D,H,W)
    pos01 = rng.random((50, 3)).astype(np.float32)

    got = np.asarray(grid_sample_3d(jnp.asarray(grid[0]), jnp.asarray(pos01)))

    tpos = torch.from_numpy(pos01 * 2 - 1).reshape(1, 50, 1, 1, 3)
    ref = F.grid_sample(torch.from_numpy(grid), tpos,
                        align_corners=False, padding_mode="border")
    ref = ref[0, :, :, 0, 0].T.numpy()  # (50, C)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_grid_sample_border_padding(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    grid = rng.random((1, 2, 4, 4, 4)).astype(np.float32)
    pos01 = (rng.random((20, 3)) * 2 - 0.5).astype(np.float32)  # outside too
    got = np.asarray(grid_sample_3d(jnp.asarray(grid[0]), jnp.asarray(pos01)))
    tpos = torch.from_numpy(pos01 * 2 - 1).reshape(1, 20, 1, 1, 3)
    ref = F.grid_sample(torch.from_numpy(grid), tpos,
                        align_corners=False, padding_mode="border")
    np.testing.assert_allclose(got, ref[0, :, :, 0, 0].T.numpy(), atol=1e-5)


def test_input_parametrization_layout(rng):
    """Output = [pos, cos(Bx), sin(Bx), extra]
    (reference: network.py:124-169)."""
    ip = InputParametrization.make(num_fourier=4, fourier_std=1.0, seed=7)
    x = rng.random((5, 3 + 2)).astype(np.float32)  # 3 pos + 2 latent extra
    y = np.asarray(ip(jnp.asarray(x)))
    assert y.shape == (5, 3 + 8 + 2)
    B = np.asarray(ip.fourier_matrix)
    f = x[:, :3] @ B.T
    np.testing.assert_allclose(y[:, :3], x[:, :3], atol=1e-6)
    np.testing.assert_allclose(y[:, 3:7], np.cos(f), atol=1e-5)
    np.testing.assert_allclose(y[:, 7:11], np.sin(f), atol=1e-5)
    np.testing.assert_allclose(y[:, 11:], x[:, 3:], atol=1e-6)


def test_input_parametrization_nerf_matrix():
    ip = InputParametrization.make(num_fourier=6, fourier_std=-1)
    B = np.asarray(ip.fourier_matrix) / (2 * np.pi)
    np.testing.assert_allclose(B[:3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(B[3:6], 2 * np.eye(3), atol=1e-6)


def test_srn_forward_shapes():
    net = SceneRepresentationNetwork.make(
        layers="16:16", activation="ReLU", num_fourier=4,
        output_mode="density")
    x = jnp.asarray(np.random.default_rng(0).random((10, 3)), jnp.float32)
    y = net(x)
    assert y.shape == (10, 1)
    assert np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))  # sigmoid

    net4 = SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:1", num_fourier=4,
        output_mode="rgbo")
    y4 = net4(x)
    assert y4.shape == (10, 4)
    assert np.all(np.asarray(y4[:, 3]) >= 0)  # softplus absorption


def test_srn_with_latent_grid(rng):
    grid = (rng.standard_normal((8, 6, 6, 6)) * 0.01).astype(np.float32)
    latent = LatentSpace(static_grid=jnp.asarray(grid))
    assert latent.total_channels == 8
    net = SceneRepresentationNetwork.make(
        layers="16", activation="ReLU", num_fourier=4, latent=latent)
    x = jnp.asarray(rng.random((10, 3)), jnp.float32)
    y = net(x)
    assert y.shape == (10, 1)
    # gradients reach the latent grid
    g = jax.grad(lambda n: jnp.sum(n(x)))(net)
    assert np.abs(np.asarray(g.latent.static_grid)).max() > 0


def test_srn_time_ensemble_vectors(rng):
    latent = LatentSpace(
        time_vector=jnp.asarray(rng.random((1, 2, 4)), jnp.float32),
        ensemble_vector=jnp.asarray(rng.random((1, 3, 5)), jnp.float32))
    assert latent.total_channels == 5
    net = SceneRepresentationNetwork.make(
        layers="16", activation="ReLU", num_fourier=2, latent=latent)
    x = jnp.asarray(rng.random((6, 3)), jnp.float32)
    t = jnp.linspace(0, 3, 6)
    e = jnp.linspace(0, 4, 6)
    y = net(x, time=t, ensemble=e)
    assert y.shape == (6, 1)
    # different time -> different latent -> different output
    y2 = net(x, time=t + 0.5, ensemble=e)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_keyframe_grid_sample(rng):
    grids = rng.random((3, 2, 4, 4, 4)).astype(np.float32)
    pos = rng.random((10, 3)).astype(np.float32)
    g = jnp.asarray(grids)
    # t = 1.5 is the mean of keyframes 1 and 2
    mid = np.asarray(keyframe_grid_sample(g, jnp.asarray(pos),
                                          jnp.float32(1.5)))
    lo = np.asarray(grid_sample_3d(g[1], jnp.asarray(pos)))
    hi = np.asarray(grid_sample_3d(g[2], jnp.asarray(pos)))
    np.testing.assert_allclose(mid, (lo + hi) / 2, atol=1e-5)
    # clamping beyond the last keyframe
    end = np.asarray(keyframe_grid_sample(g, jnp.asarray(pos),
                                          jnp.float32(5.0)))
    np.testing.assert_allclose(end, np.asarray(grid_sample_3d(
        g[2], jnp.asarray(pos))), atol=1e-5)
