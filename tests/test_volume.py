"""Volume interpolation tests (reference: renderer/renderer_volume_grid.cuh,
renderer/volume_implicit.cpp, unittests/testVolumeInterpolation.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvsrn_tpu.volume.grid import (
    VolumeInterpolationGrid, sample_linear, sample_nearest, sample_cubic)
from fvsrn_tpu.volume.implicit import (
    IMPLICIT_EQUATIONS, VolumeInterpolationImplicit, create_implicit_grid)


def test_implicit_sphere_center():
    vol = VolumeInterpolationImplicit.make("SPHERE")
    d, inside = vol.eval_density(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(d), 1.0, atol=1e-6)
    assert bool(inside[0])
    # outside the box
    d, inside = vol.eval_density(jnp.asarray([[2.0, 0, 0]]))
    assert not bool(inside[0])


def test_implicit_all_equations_finite():
    pts = jnp.asarray(np.random.default_rng(0).random((32, 3)) - 0.5,
                      jnp.float32)
    for name in IMPLICIT_EQUATIONS:
        vol = VolumeInterpolationImplicit.make(name)
        d, _ = vol.eval_density(pts)
        assert np.all(np.isfinite(np.asarray(d))), name


def test_implicit_grid_voxelization():
    """Voxel i samples world boxMin + i*(boxMax-boxMin)/(res-1)
    (reference: renderer/volume.cpp:870-891)."""
    g = np.asarray(create_implicit_grid(9, "SPHERE"))
    # center voxel (4,4,4) -> world (0,0,0) -> density 1
    np.testing.assert_allclose(g[4, 4, 4], 1.0, atol=1e-6)
    # corner voxel -> world (-1,-1,-1) -> 1 - sqrt(3)
    np.testing.assert_allclose(g[0, 0, 0], 1 - np.sqrt(3), atol=1e-5)


def test_grid_sample_exact_at_centers(rng):
    data = jnp.asarray(rng.random((5, 6, 7)).astype(np.float32))
    vol = VolumeInterpolationGrid.from_grid(data)
    res = np.asarray([5, 6, 7], np.float64)
    # voxel i maps to world p with (p-bmin)/bsize*res == i
    idx = np.stack(np.meshgrid(np.arange(5), np.arange(6), np.arange(7),
                               indexing="ij"), -1).reshape(-1, 3)
    world = (np.asarray(vol.box_min)
             + idx / res * np.asarray(vol.box_size)).astype(np.float32)
    d, inside = vol.eval_density(jnp.asarray(world))
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(data).reshape(-1), atol=1e-5)
    assert np.all(np.asarray(inside))


def test_grid_trilinear_midpoint(rng):
    data = jnp.asarray(rng.random((4, 4, 4)).astype(np.float32))
    # midpoint between voxel (1,1,1) and (2,1,1)
    v = sample_linear(data, jnp.asarray([[1.5, 1.0, 1.0]]))
    expect = 0.5 * (data[1, 1, 1] + data[2, 1, 1])
    np.testing.assert_allclose(np.asarray(v)[0], float(expect), atol=1e-6)


def test_grid_clamping(rng):
    data = jnp.asarray(rng.random((4, 4, 4)).astype(np.float32))
    # far outside: clamps to border voxel
    v = sample_linear(data, jnp.asarray([[-3.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(v)[0], float(data[0, 0, 0]),
                               atol=1e-6)


def test_grid_cubic_reproduces_smooth(rng):
    """Tricubic b-spline approximates a linear field exactly (partition of
    unity + linear precision)."""
    x = np.arange(8, dtype=np.float32)
    data = jnp.asarray(np.broadcast_to(x[:, None, None], (8, 8, 8)))
    pos = jnp.asarray([[3.3, 4.0, 4.0], [2.7, 2.0, 5.0]], jnp.float32)
    v = sample_cubic(data, pos)
    # the -0.5 grid shift and the +0.5 fetch shift cancel: linear precision
    # reproduces f(pos) exactly (reference: renderer_volume_grid.cuh:155-188)
    np.testing.assert_allclose(np.asarray(v), [3.3, 2.7], atol=1e-5)


def test_grid_normal_matches_autodiff_on_linear_field():
    """For a linear density field the 1-voxel central difference
    (reference: volume_interpolation_grid.cpp:1040-1046) and the exact
    autodiff gradient of the trilerp agree."""
    ii = np.arange(16, dtype=np.float32)
    data = (ii[:, None, None] + 2 * ii[None, :, None]
            + 3 * ii[None, None, :])
    vol = VolumeInterpolationGrid.from_grid(jnp.asarray(data))
    pos = jnp.asarray([[0.1, 0.05, -0.08]], jnp.float32)
    n = np.asarray(vol.eval_normal(pos))[0]
    g = jax.grad(lambda p: vol.eval_density(p)[0].sum())(pos)
    np.testing.assert_allclose(n, np.asarray(g)[0], rtol=1e-4)


def test_grid_batched(rng):
    data = jnp.asarray(rng.random((2, 4, 4, 4)).astype(np.float32))
    vol = VolumeInterpolationGrid.from_grid(data)
    assert vol.batch == 2
    pos = jnp.zeros((3, 3), jnp.float32)
    d0, _ = vol.eval_density(pos, b=0)
    d1, _ = vol.eval_density(pos, b=1)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
