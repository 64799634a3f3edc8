"""Fused SRN sample evaluator: density (+ gradient) for ARBITRARY
position batches as one pallas_call.

The reference's volume abstraction puts the tensor-core MLP inside
EVERY evaluator -- including the Monte-Carlo delta-tracking kernel
(renderer_ray_evaluation_monte_carlo.cuh:59-317 calls ``volume.eval``
per tracking step, which for networks is the fused wmma MLP,
renderer_volume_tensorcores.cuh:736) and the generic sample kernels
(renderer_volume_kernels1.cuh). This module is the TPU counterpart for
NON-marching sample batches (scattered MC tracking positions,
world-training points, importance sampling): positions are not
tile-coherent, so the boxfeat window certificates don't apply; instead
the latent trilerp rides the round-1 neighborhood-table row gather
(ONE (N, 128) XLA gather, zero lane padding) and the kernel does the
corner-weighted resolve + transposed MLP + optional in-kernel position
gradient (the same `_mlp_position_grad_T` sweep the fused-normals DVR
uses).

Forward-only by design (MC estimators and samplers do not
differentiate through the evaluator); training paths use the fused DVR
engines or the plain oracle.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.latent import resolve_grid
from ..models.srn import SceneRepresentationNetwork
from .fused_dvr import (_corner_weight_pack, _mlp_forward_T,
                        _mlp_position_grad_T, _weight_list,
                        build_neighborhood_table, extract_weights)


def _eval_kernel(x_ref, *refs, n_hidden: int, activation: str,
                 act_param: float, output_mode: str, has_latent: bool,
                 grid_sizes: tuple, compute_dtype, has_direction: bool,
                 want_grad: bool, out_rows: int):
    rows_ref = None
    dirs_ref = None
    if has_latent:
        rows_ref = refs[0]
        refs = refs[1:]
    if has_direction:
        dirs_ref = refs[0]
        refs = refs[1:]
    (fourier_ref, fdir_ref, w1pos_ref, w1dir_ref, w1cos_ref, w1sin_ref,
     w1lat_ref, b1_ref) = refs[0:8]
    rest = refs[8:]
    hw = rest[:n_hidden]
    hb = rest[n_hidden:2 * n_hidden]
    wout_ref = rest[2 * n_hidden]
    bout_ref = rest[2 * n_hidden + 1]
    out_ref = rest[2 * n_hidden + 2]

    f32 = jnp.float32
    x = x_ref[:].astype(f32)                      # (3, tile)
    dirs = dirs_ref[:].astype(f32) if has_direction else None
    lat = None
    rows_t = None
    if has_latent:
        rows_t = rows_ref[:].astype(f32).T        # (128, tile)
        wrep = _corner_weight_pack(x, grid_sizes)
        lat = rows_t * wrep
    value, dv_dy, pack = _mlp_forward_T(
        x, dirs, lat, fourier_ref[:],
        fdir_ref[:] if has_direction else None, w1pos_ref[:],
        w1dir_ref[:] if has_direction else None,
        w1cos_ref[:], w1sin_ref[:],
        w1lat_ref[:] if has_latent else None, b1_ref[:],
        [w[:] for w in hw], [b[:] for b in hb],
        wout_ref[:], bout_ref[:],
        activation=activation, act_param=act_param,
        output_mode=output_mode, compute_dtype=compute_dtype,
        want_pack=want_grad)
    rows = [value]
    if want_grad:
        g01 = _mlp_position_grad_T(
            pack, dv_dy, x, rows_t, fourier_ref[:], w1pos_ref[:],
            w1cos_ref[:], w1sin_ref[:],
            w1lat_ref[:] if has_latent else None,
            [w[:] for w in hw], wout_ref[:],
            activation=activation, act_param=act_param,
            grid_sizes=grid_sizes, has_latent_table=has_latent,
            compute_dtype=compute_dtype)
        rows.append(g01)                          # (3, tile), d/d pos01
    got = sum(r.shape[0] for r in rows)
    if got < out_rows:
        rows.append(jnp.zeros((out_rows - got, x.shape[1]), f32))
    out_ref[:] = jnp.concatenate(rows, axis=0)


def make_fused_eval(net: SceneRepresentationNetwork, box_min, box_size,
                    *, time=0.0, ensemble=0.0, tile: int = 2048,
                    compute_dtype=jnp.float32,
                    table_dtype=jnp.float32,
                    want_grad: bool = False,
                    interpret: bool = False):
    """Build ``eval(positions (..., 3), dirs (..., 3)|None) ->
    (value (...,), inside (...,)[, grad (..., 3) wrt WORLD position])``.

    jit-safe (static shapes per padded batch); the neighborhood table
    and weights close over the returned callable, so jit caches one
    kernel per (net shape, tile). Matches
    ``VolumeInterpolationNetwork.eval_density`` (screen-mode output
    clamp) -- oracle-tested in tests/test_fused_eval.py.
    """
    if not net.output_mode.startswith("density"):
        raise NotImplementedError("fused sample evaluator: density "
                                  "networks (MC tracks scalar density)")
    # 1D latent vectors fold into the first-layer bias at this
    # (time, ensemble) (fused_dvr.extract_weights); grids stay per-sample
    weights = extract_weights(net, jnp.float32, time=time,
                              ensemble=ensemble)
    has_latent = weights.w1_lat is not None
    grid_sizes = (1, 1, 1)
    table = None
    if has_latent:
        latent_grid = jnp.asarray(
            resolve_grid(net.latent, time, ensemble), jnp.float32)
        _, gd, gh, gw = latent_grid.shape
        grid_sizes = (gw, gh, gd)
        table = build_neighborhood_table(latent_grid).astype(table_dtype)
        # table rows are 8 corners x 16 zero-padded channels: pad the
        # latent weight block to 16 before the 8-corner tiling
        w1l = weights.w1_lat
        cl = w1l.shape[1]
        if cl < 16:
            w1l = jnp.concatenate(
                [w1l, jnp.zeros((w1l.shape[0], 16 - cl), w1l.dtype)],
                axis=1)
        weights = weights._replace(w1_lat=jnp.tile(w1l, (1, 8)))
    has_direction = net.input.has_direction
    bm = np.asarray(box_min, np.float32)
    bs = np.asarray(box_size, np.float32)
    # out rows padded to the f32 sublane tile
    out_rows = 8
    statics = dict(
        n_hidden=len(weights.hidden_w),
        activation=net.layers[0].activation,
        act_param=net.layers[0].activation_param,
        output_mode=net.output_mode,
        has_latent=has_latent, grid_sizes=grid_sizes,
        compute_dtype=compute_dtype, has_direction=has_direction,
        want_grad=want_grad, out_rows=out_rows)
    # drop the TF row from the weight operand list (evaluator has none)
    wlist = _weight_list(weights, jnp.zeros((1, 8), jnp.float32))[:-1]

    def _const(w):
        return pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_eval_kernel, **statics)

    def run(x_t, rows, dirs_t):
        n = x_t.shape[1]
        in_specs = [pl.BlockSpec((3, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
        ins = [x_t]
        if has_latent:
            in_specs.append(pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
            ins.append(rows)
        if has_direction:
            in_specs.append(pl.BlockSpec((3, tile), lambda i: (0, i),
                                         memory_space=pltpu.VMEM))
            ins.append(dirs_t)
        in_specs += [_const(w) for w in wlist]
        call = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((out_rows, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )
        return call(*ins, *wlist)

    def evaluate(position: Array, direction: Optional[Array] = None):
        lead = position.shape[:-1]
        pos = position.reshape(-1, 3).astype(jnp.float32)
        n0 = pos.shape[0]
        pos01 = (pos - bm) / bs
        inside = (jnp.all(pos01 >= 0, axis=-1)
                  & jnp.all(pos01 <= 1, axis=-1))
        npad = -(-n0 // tile) * tile
        if npad != n0:
            pos01 = jnp.pad(pos01, ((0, npad - n0), (0, 0)))
        x_t = pos01.T                              # (3, N)
        rows = None
        if has_latent:
            v = pos01 * jnp.asarray(grid_sizes, jnp.float32) - 0.5
            b = jnp.clip(jnp.floor(v).astype(jnp.int32) + 1, 0,
                         jnp.asarray(grid_sizes, jnp.int32))
            rid = ((b[:, 2] * (grid_sizes[1] + 1) + b[:, 1])
                   * (grid_sizes[0] + 1) + b[:, 0])
            rows = table.at[rid].get(mode="promise_in_bounds")
        dirs_t = None
        if has_direction:
            d = (jnp.broadcast_to(direction, position.shape)
                 .reshape(-1, 3).astype(jnp.float32)
                 if direction is not None
                 else jnp.zeros_like(pos))
            if npad != n0:
                d = jnp.pad(d, ((0, npad - n0), (0, 0)))
            dirs_t = d.T
        out = run(x_t, rows, dirs_t)
        value = out[0, :n0].reshape(lead)
        inside = inside.reshape(lead)
        if want_grad:
            grad01 = out[1:4, :n0].T / bs          # d/d world position
            return value, inside, grad01.reshape(lead + (3,))
        return value, inside

    return evaluate
