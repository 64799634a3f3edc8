"""Compositing (blending) of per-step contributions.

Rebuild of ``Blending`` (reference: renderer/blending.h:15-55,
renderer/renderer_blending.cuh): front-to-back "over" compositing where the
incoming contribution carries *absorption* in its w channel (already scaled
by the stepsize in the TF). Two modes:
- ``beer_lambert``: current_alpha = 1 - exp(-absorption)
- ``alpha``: current_alpha = min(1, absorption)

The helpers operate on channel-last arrays; normals and depth blend with the
same (1 - acc_alpha) * current_alpha weights as color
(reference: renderer_blending.cuh:36-52).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

BLEND_BEER_LAMBERT = "beer_lambert"
BLEND_ALPHA = "alpha"


def current_alpha(absorption: Array, mode: str) -> Array:
    if mode == BLEND_BEER_LAMBERT:
        return 1.0 - jnp.exp(-absorption)
    elif mode == BLEND_ALPHA:
        return jnp.minimum(1.0, absorption)
    raise ValueError(f"unknown blend mode {mode}")


def blend_step(acc_rgb: Array, acc_alpha: Array,
               contrib_rgba: Array, mode: str = BLEND_BEER_LAMBERT,
               acc_normal: Array | None = None,
               contrib_normal: Array | None = None,
               acc_depth: Array | None = None,
               contrib_depth: Array | None = None):
    """One front-to-back blending step.

    acc_rgb (..., 3), acc_alpha (..., 1), contrib_rgba (..., 4) with
    absorption in w. Returns updated accumulators (plus normal/depth when
    given), matching ``Blending::eval``
    (reference: renderer_blending.cuh:20-52).
    """
    ca = current_alpha(contrib_rgba[..., 3:4], mode)
    w = (1.0 - acc_alpha) * ca
    out_rgb = acc_rgb + w * contrib_rgba[..., :3]
    out_alpha = acc_alpha + (1.0 - acc_alpha) * ca
    extras = []
    if acc_normal is not None:
        extras.append(acc_normal + w * contrib_normal)
    if acc_depth is not None:
        extras.append(acc_depth + w * contrib_depth)
    return (out_rgb, out_alpha, *extras)
