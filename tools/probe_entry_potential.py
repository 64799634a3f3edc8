#!/usr/bin/env python
"""Measure the potential of ENTRY empty-space skipping (tmin clip) on
the trained flagship scene: per-ray depth of first non-negligible
opacity (via probe_saturation_tmax with a tiny alpha threshold), then
the tile-coherent advance (min over each 256-ray tile) as a fraction
of the saturation-clipped march span the forward currently pays."""
import os
import sys

import numpy as np

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
import jax  # noqa: E402

os.makedirs(os.path.join(root, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(root, ".jax_cache"))
import fvsrn_tpu as fv  # noqa: E402
from fvsrn_tpu.camera import (CameraOnASphere, camera_matrix,  # noqa: E402
                              generate_rays)
from fvsrn_tpu.inference import LoadedModel  # noqa: E402
from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork  # noqa: E402
from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation,  # noqa: E402
                                     probe_saturation_tmax)
from fvsrn_tpu.raytracer.dvr import max_steps_bound  # noqa: E402
from fvsrn_tpu.utils.vecmath import intersect_aabb  # noqa: E402

W = H = 512
STEP = 1.0 / 512
TILE = 256

tf = fv.TransferFunctionPiecewiseLinear.make(
    rgb=[[0.1, 0.1, 0.8], [0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
    opacity=[0.0, 10.0, 30.0], positions=[0.0, 0.5, 1.0])
model = LoadedModel.from_checkpoint(
    os.path.join(root, "assets", "flagship_mlobb.hdf5"), tf=tf)
nvol = VolumeInterpolationNetwork.make(model.network)
steps = max_steps_bound((1.0, 1.0, 1.0), STEP)
cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
s, d = generate_rays(np.asarray(camera_matrix(cam)), W, H,
                     fov_y_radians=0.7853981633974483)
perm, _ = block_ray_permutation(W, H, 16, 16)
rs = np.asarray(s).reshape(-1, 3)[perm]
rd = np.asarray(d).reshape(-1, 3)[perm]

# geometric span
import jax.numpy as jnp  # noqa: E402
tmin, tmax = intersect_aabb(jnp.asarray(rs), jnp.asarray(rd),
                            jnp.asarray([-0.5, -0.5, -0.5], jnp.float32),
                            jnp.asarray([1.0, 1.0, 1.0], jnp.float32))
tmin = np.maximum(np.asarray(tmin), 0.0).reshape(-1)
tmax_g = np.asarray(tmax).reshape(-1)

# saturation clip (what the forward already pays)
sat = probe_saturation_tmax(rs, rd, nvol, tf, stepsize=STEP,
                            max_steps=steps, coarse=8, margin_steps=16)
tmax_c = np.minimum(tmax_g, np.asarray(sat).reshape(-1))

# entry depth: accumulated alpha crosses 1e-3 (coarse=8, same stride
# as the saturation probe; margin 0 -> the crossing t itself)
for thr in (1e-3,):
    ent = probe_saturation_tmax(rs, rd, nvol, tf, stepsize=STEP,
                                max_steps=steps, coarse=8,
                                alpha_threshold=thr, margin_steps=0)
    ent = np.minimum(np.asarray(ent).reshape(-1), tmax_c)  # never past the clip
    adv_ray = np.maximum(ent - tmin, 0.0)
    n_tiles = rs.shape[0] // TILE
    adv_tile = adv_ray.reshape(n_tiles, TILE).min(axis=1)
    span = np.maximum(tmax_c - tmin, 0.0).reshape(n_tiles, TILE).max(axis=1)
    live = span > 0
    frac = (adv_tile[live].sum() / span[live].sum())
    print(f"thr={thr}: mean ray advance {adv_ray.mean()/STEP:.0f} steps, "
          f"mean tile-min advance {adv_tile[live].mean()/STEP:.0f} steps, "
          f"mean tile span {span[live].mean()/STEP:.0f} steps, "
          f"tile-coherent fraction of march skippable = {frac:.3f}")
