"""Latent spaces: 1D keyframe vectors and volumetric latent grids.

Rebuild of the reference's latent machinery:
- ``interp1d``: differentiable piecewise-linear interpolation of latent
  vectors over keyframes (reference: renderer/pytorch_functions.h:22-48
  ``PytorchFunctions::interp1D``, custom CUDA fwd/bwd; here plain JAX, AD
  supplies the adjoint).
- ``grid_sample_3d``: trilinear latent-grid lookup with
  ``align_corners=False`` / border padding, matching ``F.grid_sample`` as
  used by the SRN forward (reference: applications/volnet/network.py:
  1026-1084) — this is the training-time oracle for the fused kernel's
  latent-grid fetch (reference: renderer_volume_tensorcores.cuh:839-948).
- ``LatentSpace``: container combining time/ensemble keyframed grids, a
  static grid, and time/ensemble latent vectors (reference: network.py:
  723-773 and volume_interpolation_network.h:174-434 LatentGrid /
  LatentGridTimeAndEnsemble).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct


def interp1d(fp: Array, x: Array) -> Array:
    """Piecewise-linear interpolation at control points 0..N-1.

    fp: (B, C, N) values; x: (B, M) positions (clamped to [0, N-1]).
    Returns (B, C, M). Matches ``pyrenderer.interp1D``
    (reference: pytorch_functions.h:22-48).
    """
    fp = jnp.asarray(fp)
    n = fp.shape[-1]
    xc = jnp.clip(x, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, n - 2)
    f = xc - i0  # (B, M)
    v0 = jnp.take_along_axis(fp, i0[:, None, :], axis=-1)
    v1 = jnp.take_along_axis(fp, (i0 + 1)[:, None, :], axis=-1)
    return v0 + (v1 - v0) * f[:, None, :]


def grid_sample_3d(grid: Array, pos01: Array) -> Array:
    """Trilinear sampling of a latent grid, torch ``F.grid_sample`` semantics
    with align_corners=False and border padding.

    grid: (C, D, H, W) where (D, H, W) are indexed by (z, y, x) -- the torch
    convention the reference uses (network.py:1026-1033: grid coords are
    (x, y, z) with x indexing W).
    pos01: (..., 3) positions in [0, 1]^3, (x, y, z) order.
    Returns (..., C).
    """
    grid = jnp.asarray(grid)
    c, dd, hh, ww = grid.shape
    sizes = jnp.asarray([ww, hh, dd], pos01.dtype)  # per (x, y, z)
    # align_corners=False: voxel centers at (i+0.5)/S, i.e. v = p*S - 0.5
    v = pos01 * sizes - 0.5
    i0 = jnp.floor(v).astype(jnp.int32)
    f = v - jnp.floor(v)
    maxi = jnp.asarray([ww - 1, hh - 1, dd - 1], jnp.int32)
    lo = jnp.clip(i0, 0, maxi)
    hi = jnp.clip(i0 + 1, 0, maxi)

    def gather(ix, iy, iz):
        # grid is (C, z, y, x); vectorized gather returns (C, ...) -> move
        return jnp.moveaxis(grid[:, iz, iy, ix], 0, -1)

    fx = f[..., 0:1]
    fy = f[..., 1:2]
    fz = f[..., 2:3]
    c000 = gather(lo[..., 0], lo[..., 1], lo[..., 2])
    c100 = gather(hi[..., 0], lo[..., 1], lo[..., 2])
    c010 = gather(lo[..., 0], hi[..., 1], lo[..., 2])
    c110 = gather(hi[..., 0], hi[..., 1], lo[..., 2])
    c001 = gather(lo[..., 0], lo[..., 1], hi[..., 2])
    c101 = gather(hi[..., 0], lo[..., 1], hi[..., 2])
    c011 = gather(lo[..., 0], hi[..., 1], hi[..., 2])
    c111 = gather(hi[..., 0], hi[..., 1], hi[..., 2])
    c00 = c000 + (c100 - c000) * fx
    c10 = c010 + (c110 - c010) * fx
    c01 = c001 + (c101 - c001) * fx
    c11 = c011 + (c111 - c011) * fx
    c0 = c00 + (c10 - c00) * fy
    c1 = c01 + (c11 - c01) * fy
    return c0 + (c1 - c0) * fz


def keyframe_grid_sample(grids: Array, pos01: Array, t: Array) -> Array:
    """Sample a keyframed grid stack (K, C, D, H, W) at scalar time ``t``
    (in keyframe index units): trilerp both bracketing keyframes, lerp in
    time (reference: network.py:1026-1054)."""
    k = grids.shape[0]
    tc = jnp.clip(jnp.floor(t), 0, k - 1).astype(jnp.int32)
    t_hi = jnp.minimum(tc + 1, k - 1)
    f = t - tc.astype(t.dtype)
    lo = grid_sample_3d(jnp.take(grids, tc, axis=0), pos01)
    hi = grid_sample_3d(jnp.take(grids, t_hi, axis=0), pos01)
    return lo + (hi - lo) * f


def keyframe_lerp(grids: Array, t) -> Array:
    """Pre-lerp a keyframe grid stack (K, C, D, H, W) at scalar ``t``
    (keyframe index units) into ONE (C, D, H, W) grid.

    Trilinear sampling is linear in the grid values, so
    ``trilerp(lerp(G_k, G_k+1, f), x) == lerp(trilerp(G_k, x),
    trilerp(G_k+1, x), f)`` exactly: pre-lerping the two bracketing
    keyframes once per frame (a ~2 MB elementwise op) is the TPU-native
    equivalent of the reference's per-sample two-texture fetch + lerp
    inside the march (reference: renderer_volume_tensorcores.cuh:903-948,
    volume_interpolation_network.h:318-434 LatentGridTimeAndEnsemble).
    Matches :func:`keyframe_grid_sample` to float precision; gradients
    flow to both bracketing keyframes through the lerp.
    """
    grids = jnp.asarray(grids)
    k = grids.shape[0]
    t = jnp.asarray(t, grids.dtype)
    tc = jnp.clip(jnp.floor(t), 0, k - 1).astype(jnp.int32)
    hi = jnp.minimum(tc + 1, k - 1)
    f = t - tc.astype(grids.dtype)
    lo_g = jnp.take(grids, tc, axis=0)
    hi_g = jnp.take(grids, hi, axis=0)
    return lo_g + (hi_g - lo_g) * f


def resolve_grid(latent: "LatentSpace", time=0.0, ensemble=0.0):
    """Collapse the latent space's volumetric grids to one static
    (C, D, H, W) grid at scalar (time, ensemble) conditioning.

    This is what lets the fused Pallas kernel serve time/ensemble-keyframed
    SRNs with the *static-grid* data path unchanged (see
    :func:`keyframe_lerp` for the exactness argument). Returns ``None``
    when the latent space has no volumetric grids. Channel order matches
    :meth:`LatentSpace.evaluate` (time grid, then ensemble grid).
    """
    if latent.time_dependent:
        feats = []
        if latent.time_grid is not None:
            feats.append(keyframe_lerp(latent.time_grid, time))
        if latent.ensemble_grid is not None:
            feats.append(keyframe_lerp(latent.ensemble_grid, ensemble))
        if not feats:
            return None
        if len(feats) == 1:
            return feats[0]
        if feats[0].shape[1:] != feats[1].shape[1:]:
            raise ValueError(
                "fused path requires time and ensemble grids of equal "
                f"resolution, got {feats[0].shape} vs {feats[1].shape}")
        return jnp.concatenate(feats, axis=0)
    return latent.static_grid


@struct
class LatentSpace:
    """All latent conditioning inputs of the SRN.

    Exactly one of {static_grid, (time_grid/ensemble_grid)} is used for
    volumetric features; time_vector/ensemble_vector provide per-keyframe
    latent vectors interpolated with :func:`interp1d`
    (reference: network.py:723-773).
    """
    static_grid: Optional[Array] = None     # (C, R, R, R)
    time_grid: Optional[Array] = None       # (T, Ct, R, R, R)
    ensemble_grid: Optional[Array] = None   # (E, Ce, R, R, R)
    time_vector: Optional[Array] = None     # (1, Ct, K)
    ensemble_vector: Optional[Array] = None  # (1, Ce, K)
    time_dependent: bool = static_field(default=False)

    @property
    def total_channels(self) -> int:
        c = 0
        if self.time_dependent:
            if self.time_grid is not None:
                c += self.time_grid.shape[1]
            if self.ensemble_grid is not None:
                c += self.ensemble_grid.shape[1]
        else:
            if self.ensemble_vector is not None:
                c += self.ensemble_vector.shape[1]
            if self.time_vector is not None:
                c += self.time_vector.shape[1]
            if self.static_grid is not None:
                c += self.static_grid.shape[0]
        return c

    def is_empty(self) -> bool:
        return self.total_channels == 0

    def evaluate(self, x: Array, time: Array, ensemble: Array) -> list[Array]:
        """Latent features for positions x (N, 3) in [0,1]^3.

        ``time``/``ensemble``: (N,) for mixed latent spaces (vector
        interpolation), scalars for time-dependent grids (the reference
        requires uniform batches there, network.py:1017-1023).
        Returns a list of (N, C_i) feature blocks in the reference's
        concatenation order (ensemble vector, time vector, grid features /
        time grid then ensemble grid).
        """
        feats = []
        if self.time_dependent:
            if self.time_grid is not None:
                t = jnp.reshape(time, (-1,))[0]
                feats.append(keyframe_grid_sample(self.time_grid, x, t))
            if self.ensemble_grid is not None:
                e = jnp.reshape(ensemble, (-1,))[0]
                feats.append(keyframe_grid_sample(self.ensemble_grid, x, e))
        else:
            if self.ensemble_vector is not None:
                v = interp1d(self.ensemble_vector,
                             jnp.reshape(ensemble, (1, -1)))  # (1, C, N)
                feats.append(jnp.moveaxis(v[0], 0, -1))
            if self.time_vector is not None:
                v = interp1d(self.time_vector, jnp.reshape(time, (1, -1)))
                feats.append(jnp.moveaxis(v[0], 0, -1))
            if self.static_grid is not None:
                feats.append(grid_sample_3d(self.static_grid, x))
        return feats
