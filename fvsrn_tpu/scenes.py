"""Canonical benchmark scenes: ONE definition shared by training tools,
bench.py, and the eval harnesses.

The reference ships its benchmark scenes as config-file JSONs
(reference: applications/config-files/*.json, e.g. ejecta70-v6-dvr.json)
so every script renders the same TF/camera; this module plays that role
for the two contracted scene classes:

- ``dense``  -- the Marschner-Lobb flagship with a ramp-from-zero TF.
  Every density maps to nonzero opacity: no empty space exists under the
  TF, so early-out/culling machinery is structurally dead (PERF.md
  round 4: "zero skippable"). This is the adversarial floor-measuring
  scene.
- ``sparse`` -- the MULTI_SHELL synthetic with a zero-opacity-band TF
  (opacity identically 0 below density 0.30): the scene class the
  reference's headline economics live on (its config-file TFs carry
  zero bands and its in-kernel early-outs pay per step,
  renderer_ray_evaluation_stepping_dvr.cuh:84-154). Here saturation
  clipping, entry clipping, occupancy culling, and the in-kernel vote
  all compound.
"""
from __future__ import annotations

import os

from .transfer import TransferFunctionPiecewiseLinear
from .volume.implicit import VolumeInterpolationImplicit

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")

# the zero band of the sparse TF: opacity == 0 for density < this
SPARSE_ZERO_BAND = 0.30


def dense_scene():
    """(volume, tf, checkpoint_path) of the dense-TF flagship scene."""
    volume = VolumeInterpolationImplicit.make("MARSCHNER_LOBB")
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 10.0, 30.0], positions=[0.0, 0.5, 1.0])
    return volume, tf, os.path.join(ASSET_DIR, "flagship_mlobb.hdf5")


def sparse_scene():
    """(volume, tf, checkpoint_path) of the sparse-TF flagship scene."""
    volume = VolumeInterpolationImplicit.make("MULTI_SHELL")
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.2, 0.4, 1.0], [0.2, 0.4, 1.0], [1.0, 0.6, 0.15],
             [1.0, 0.95, 0.7]],
        opacity=[0.0, 0.0, 18.0, 40.0],
        positions=[0.0, SPARSE_ZERO_BAND, 0.6, 1.0])
    return volume, tf, os.path.join(ASSET_DIR, "flagship_shell.hdf5")
