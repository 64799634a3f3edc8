"""Importance sampling of training positions (rejection sampling).

Rebuild of ``IVolumeInterpolation::importanceSampling`` and
``importanceSamplingWithProbabilityGrid``
(reference: renderer/volume_interpolation.cpp:384-511 + the device kernels
renderer/renderer_volume_kernels2.cuh / kernels3.cuh):

- plain: draw uniform positions in [0,1]^3, accept with probability
  max(value / max_value, min_prob) where value is the raw density or,
  with a TF, its opacity;
- probability grid: accept with max(trilerp(grid, pos) / max_value,
  min_prob) (align-corners mapping pos*(size-1)), then evaluate the
  volume at accepted positions -- the adaptive-resampling machinery
  (reference: applications/volnet/training_data.py:646-810).

TPU-native shape: instead of per-thread busy loops, draw large candidate
batches on device, mask, and compact on the host until the requested
count is filled (rejection sampling is inherently data-dependent; the
candidate batches keep the device busy with wide vector work).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .. import transfer as transfer_mod


def _values_for(volume, tf, positions01: Array, density_min: float,
                density_max: float):
    """density + acceptance value (+rgba when a TF is given)."""
    world = volume.box_min + positions01 * volume.box_size
    density, _ = volume.eval_density(world)
    density = density[..., None]
    if tf is None:
        return density, density[..., 0], None
    color = transfer_mod.evaluate(tf, density, density_min, density_max)
    return density, color[..., 3], color


def importance_sampling(key: Array, volume, num_samples: int, *,
                        tf=None, min_prob: float = 0.01,
                        density_min: float = 0.0, density_max: float = 1.0,
                        max_value: Optional[float] = None,
                        oversample: int = 4, max_rounds: int = 64):
    """Returns (positions (N,3) in [0,1]^3, densities (N,1),
    colors (N,4) or None)."""
    if max_value is None:
        max_value = float(tf.max_absorption()) if tf is not None else 1.0

    @jax.jit
    def draw(key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (num_samples * oversample, 3))
        density, value, color = _values_for(volume, tf, pos,
                                            density_min, density_max)
        prob = jnp.maximum(value / max_value, min_prob)
        accept = prob > jax.random.uniform(k2, prob.shape)
        return pos, density, color, accept

    return _fill(key, draw, num_samples, tf is not None, max_rounds)


def importance_sampling_with_probability_grid(
        key: Array, volume, probability_grid, num_samples: int, *,
        tf=None, min_prob: float = 0.01,
        density_min: float = 0.0, density_max: float = 1.0,
        max_value: Optional[float] = None,
        oversample: int = 4, max_rounds: int = 64):
    """Rejection against a per-voxel probability grid (X, Y, Z)
    (reference: renderer_volume_kernels3.cuh:15-90)."""
    grid = jnp.asarray(probability_grid, jnp.float32)
    if max_value is None:
        max_value = float(jnp.max(grid))

    @jax.jit
    def draw(key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (num_samples * oversample, 3))
        # align-corners trilerp of the probability grid
        size2 = jnp.asarray(grid.shape, jnp.float32) - 1
        gp = pos * size2
        i0 = jnp.floor(gp).astype(jnp.int32)
        f = gp - jnp.floor(gp)
        lo = jnp.clip(i0, 0, jnp.asarray(grid.shape, jnp.int32) - 1)
        hi = jnp.clip(i0 + 1, 0, jnp.asarray(grid.shape, jnp.int32) - 1)

        def g(ix, iy, iz):
            return grid[ix, iy, iz]

        fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
        c00 = g(lo[:, 0], lo[:, 1], lo[:, 2]) * (1 - fx) \
            + g(hi[:, 0], lo[:, 1], lo[:, 2]) * fx
        c10 = g(lo[:, 0], hi[:, 1], lo[:, 2]) * (1 - fx) \
            + g(hi[:, 0], hi[:, 1], lo[:, 2]) * fx
        c01 = g(lo[:, 0], lo[:, 1], hi[:, 2]) * (1 - fx) \
            + g(hi[:, 0], lo[:, 1], hi[:, 2]) * fx
        c11 = g(lo[:, 0], hi[:, 1], hi[:, 2]) * (1 - fx) \
            + g(hi[:, 0], hi[:, 1], hi[:, 2]) * fx
        prob = (c00 * (1 - fy) + c10 * fy) * (1 - fz) \
            + (c01 * (1 - fy) + c11 * fy) * fz
        prob = jnp.maximum(prob / max_value, min_prob)
        accept = prob > jax.random.uniform(k2, prob.shape)
        density, _, color = _values_for(volume, tf, pos,
                                        density_min, density_max)
        return pos, density, color, accept

    return _fill(key, draw, num_samples, tf is not None, max_rounds)


def _fill(key, draw, num_samples, has_tf, max_rounds):
    pos_out, den_out, col_out = [], [], []
    got = 0
    for _ in range(max_rounds):
        key, sub = jax.random.split(key)
        pos, density, color, accept = draw(sub)
        acc = np.asarray(accept)
        idx = np.nonzero(acc)[0][:num_samples - got]
        if idx.size:
            pos_out.append(np.asarray(pos)[idx])
            den_out.append(np.asarray(density)[idx])
            if has_tf:
                col_out.append(np.asarray(color)[idx])
            got += idx.size
        if got >= num_samples:
            break
    else:
        raise RuntimeError(
            f"importance sampling drew only {got}/{num_samples} samples "
            f"in {max_rounds} rounds; lower min_prob or check max_value")
    positions = jnp.asarray(np.concatenate(pos_out)[:num_samples])
    densities = jnp.asarray(np.concatenate(den_out)[:num_samples])
    colors = jnp.asarray(np.concatenate(col_out)[:num_samples]) \
        if has_tf else None
    return positions, densities, colors


def loss_probability_grid(network_volume, reference_volume,
                          resolution: int = 64,
                          chunk: int = 65536) -> Array:
    """Per-voxel |error| grid for adaptive dataset rebuilds
    (reference: training_data.py:646-810 ``rebuild_dataset``: evaluate
    network vs reference on a voxel grid, use the loss as the resampling
    probability)."""
    axes = (np.arange(resolution, dtype=np.float32) + 0.5) / resolution
    gx, gy, gz = np.meshgrid(axes, axes, axes, indexing="ij")
    pos = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    @jax.jit
    def err(p):
        wn = network_volume.box_min + p * network_volume.box_size
        wr = reference_volume.box_min + p * reference_volume.box_size
        dn, _ = network_volume.eval_density(wn)
        dr, _ = reference_volume.eval_density(wr)
        return jnp.abs(dn - dr)

    outs = [np.asarray(err(jnp.asarray(pos[i:i + chunk])))
            for i in range(0, pos.shape[0], chunk)]
    return jnp.asarray(np.concatenate(outs).reshape(
        resolution, resolution, resolution))
