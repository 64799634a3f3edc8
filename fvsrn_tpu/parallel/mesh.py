"""Device mesh construction and sharding helpers.

The reference is strictly single-process single-GPU (SURVEY.md §2.3); the
scaling machinery here is original TPU-first design: rays/samples are
sharded over a ``data`` axis of a ``jax.sharding.Mesh`` (ICI within a slice,
DCN across slices), SRN parameters and latent grids are replicated, and
gradients are combined with ``psum`` inside ``shard_map`` so XLA can overlap
the all-reduce with the backward march.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    Default: one 'data' axis over all devices. ``shape`` reshapes into
    multiple named axes, e.g. shape=(2, 4), axis_names=('data', 'model').
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray/sample) axis over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of (N, ...) arrays with N sharded over ``axis``."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
