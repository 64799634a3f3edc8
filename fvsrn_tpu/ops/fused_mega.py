"""Megakernel fused SRN DVR march: ONE pallas_call per ray-bucket.

Round-2 follow-up to the per-segment fused kernel (fused_dvr.py): the
scan-of-(XLA gather + pallas_call) structure pays a fixed XLA cost per
segment (launches, gather kernels, HBM round-trips of gathered rows --
measured ~30% of the forward, PERF.md) and, in the backward, a large
XLA scatter-add of the latent-grid gradients. This module removes all
of it for latent grids that fit in VMEM (the fV-SRN regime: 32^3 x 16ch
= 1.5 MB bf16):

- grid = (ray_tiles, segments), segment minor: the whole march is one
  kernel launch; the (8, tile) output block is revisited across the
  segment axis and acts as the carry (TPU pallas grids are sequential).
- the padded latent grid lives VMEM-RESIDENT as a (Z, Y, X*128) slab;
  each (tile, segment) program slices its certified sub-box with a
  dynamic slice (8-aligned y window, 128-aligned x blocks) -- no
  gathers, no HBM round-trip, no per-segment pipeline stalls.
- per-(tile, segment) slice bases ride a tiny SMEM scalar array
  precomputed in one vectorized XLA prologue (the same endpoint-bound
  math as fused_dvr._segment_boxfeat, certified by certify_boxfeat).
- march-length adaptivity: an `active` flag per (tile, segment) skips
  dead programs (finer than bucketing alone), and the non-differentiable
  forward votes per-tile alpha saturation in-kernel (the reference's
  warp-synchronized early-out, renderer_ray_evaluation_stepping_dvr.cuh
  :93-99, at ray-tile granularity).
- the BACKWARD accumulates the latent-grid gradient into a VMEM scratch
  slab across all programs and emits it ONCE -- the XLA scatter-add
  (which dominated the round-1 backward, PERF.md) disappears entirely.
  Weight/TF gradients accumulate through revisited output blocks as
  before; the incoming-carry cotangent chains through a VMEM scratch.

Sampling is lattice-aligned (t = k*stepsize), the boxfeat convention --
compare against ``trace_dvr(..., lattice=True)``. Forward scope = the
per-segment engine's full mode matrix (shared ``_march_epilogue``):
density AND rgbo outputs, piecewise/texture/1D-preintegrated/gaussian
TFs, adjoint normals + Lambert/Blinn-Phong shading, isosurface
first-crossing, optional direction input, static or keyframed latent
grids (pre-lerped per frame), per-ray tmax_clip. The differentiable
backward covers density AND rgbo outputs x piecewise/texture-LUT/
gaussian/1D-preintegrated TFs (like the per-segment engine);
2D-preintegrated TFs and shaded losses train through the plain-JAX
oracle.

Reference analogy: this is the closest TPU shape to the reference's
single-kernel design -- renderer_volume_tensorcores.cuh keeps weights
in shared memory and latent grids in textures for the WHOLE march; here
weights and the latent slab are VMEM-resident for the whole grid.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.latent import resolve_grid
from ..models.srn import SceneRepresentationNetwork
from ..utils.vecmath import intersect_aabb
from . import fused_dvr as _fd
from .fused_dvr import (BoxfeatSpec, FusedWeights, _boxfeat_features_parts,
                        _brdf_tuple, _march_epilogue, _mlp_forward_T,
                        _prepare_tf, _weight_list, build_boxfeat_grid,
                        certify_boxfeat, extract_weights)
from .fused_dvr_bwd import bwd_segment_core

# VMEM budget for the resident latent slab (table + f32 gradient scratch
# in the backward must coexist with the activation working set)
SLAB_VMEM_LIMIT = 6 * 2 ** 20


class MegaSpec(NamedTuple):
    """Static geometry of one megakernel call (derived from a certified
    :class:`BoxfeatSpec` + the slab padding)."""
    szxc: int    # corners along x (certified)
    szyc: int    # corners along y (certified)
    szzc: int    # corners along z (certified)
    nxb: int     # x window in 128-lane blocks
    by8: int     # 8-aligned y window rows: ceil((szyc+7)/8)*8
    n_seg: int   # segment count

    @property
    def wrows(self) -> int:
        return self.szzc * self.by8

    @property
    def wspec(self):
        """(szxc, szyc, szzc, nxb, szycp) tuple for the shared boxfeat
        resolve helpers, with the y stride widened to the 8-aligned
        window (szyc := by8, szycp := szzc*by8)."""
        return (self.szxc, self.by8, self.szzc, self.nxb, self.wrows)


def mega_supported(grid_shape, table_dtype=jnp.float32) -> bool:
    """Whether a (C, D, H, W) latent grid fits the megakernel's
    VMEM-resident slab budget (worst-case y padding assumed)."""
    if grid_shape is None:
        return True
    c, d, h, w = grid_shape
    if c > 16:
        return False
    nxb_tot = (w + 2 + 7) // 8
    yp = -(-(h + 2) // 8) * 8 + 24
    bytes_ = (d + 2) * yp * nxb_tot * 128 * jnp.dtype(table_dtype).itemsize
    return bytes_ <= SLAB_VMEM_LIMIT


def _mega_spec(spec: BoxfeatSpec) -> MegaSpec:
    by8 = -(-(spec.szyc + 7) // 8) * 8
    return MegaSpec(spec.szxc, spec.szyc, spec.szzc, spec.nxb, by8,
                    spec.n_seg)


def build_boxfeat_slab(grid: Array, nxb_tot: int, yp: int) -> Array:
    """VMEM-resident latent slab: ``build_boxfeat_grid`` rows reshaped
    to (D+2, H+2, nxb_tot*128) -- element [z, y, xb*128 + lane] is
    gather row ((z*(H+2))+y)*nxb_tot + xb -- and y-padded to ``yp`` so
    every 8-aligned (by8, by8+BY8) window is in bounds. Pad rows carry
    zero trilerp weight by construction. jnp ops only (AD flows back to
    ``grid``)."""
    c, d, hh, w = grid.shape
    p6 = build_boxfeat_grid(grid, nxb_tot)
    slab = p6.reshape(d + 2, hh + 2, nxb_tot * 128)
    if yp > hh + 2:
        slab = jnp.pad(slab, ((0, 0), (0, yp - (hh + 2)), (0, 0)))
    return slab


def _mega_bases(ray_start, ray_dir, k0_ray, tmax, *, n_seg, seg, stepsize,
                tile, has_latent, grid_sizes=None, box_min=None,
                box_size=None, mspec: Optional[MegaSpec] = None,
                nxb_tot=0, yp=0, segment_active=None):
    """Vectorized XLA prologue: per-(tile, segment) slice bases + active
    flags, (T, S, 4) i32 [base_z, by8, xb0, active], plus the per-tile
    lattice base k0t (T, 1) f32. Same endpoint-bound math as
    fused_dvr._segment_boxfeat (certified by certify_boxfeat); mapped
    over segments to bound peak memory. ``segment_active``: optional
    (T, >=n_seg) i32 occupancy mask ANDed into the active flags at
    construction (folding it here avoids a post-hoc
    dynamic-update-slice on the SMEM-layout bases -- measured ~3
    ms/frame of XLA glue, round 5)."""
    h = jnp.float32(stepsize)
    r_total = ray_start.shape[0]
    n_tiles = r_total // tile
    k0r = k0_ray.reshape(n_tiles, tile)
    tmx = tmax.reshape(n_tiles, tile)
    k0t = jnp.min(k0r, axis=1)                    # (T,)
    if has_latent:
        gw_, gh_, gd_ = grid_sizes
        res_i = jnp.asarray(grid_sizes, jnp.int32)
        res_f = jnp.asarray(grid_sizes, jnp.float32)
        rs3 = ray_start.reshape(n_tiles, tile, 3)
        rd3 = ray_dir.reshape(n_tiles, tile, 3)
        bmin = jnp.asarray(np.asarray(box_min), jnp.float32)
        bsz = jnp.asarray(np.asarray(box_size), jnp.float32)

    def per_s(s):
        ka = k0t + s.astype(jnp.float32) * seg
        ta = jnp.maximum(k0r, ka[:, None]) * h
        tb = jnp.minimum(tmx, (ka[:, None] + (seg - 1)) * h)
        alive = ta <= tb
        active = jnp.any(alive, axis=1).astype(jnp.int32)   # (T,)
        if segment_active is not None:
            active = active * jax.lax.dynamic_index_in_dim(
                segment_active, s, axis=1, keepdims=False)
        if not has_latent:
            z = jnp.zeros_like(active)
            return jnp.stack([z, z, z, active], axis=1)
        bs = []
        for tv in (ta, tb):
            ps = rs3 + rd3 * tv[..., None]
            v = (ps - bmin) / bsz * res_f - 0.5
            bs.append(jnp.clip(jnp.floor(v).astype(jnp.int32) + 1,
                               0, res_i))
        blo = jnp.where(alive[..., None], jnp.minimum(*bs),
                        jnp.int32(10 ** 6)).min(axis=1)     # (T, 3)
        base_x = jnp.maximum(blo[:, 0] - 1, 0)
        xb0 = jnp.clip(base_x // 8, 0, nxb_tot - mspec.nxb)
        base_y = jnp.clip(blo[:, 1] - 1, 0, gh_ + 2 - mspec.szyc)
        by8 = jnp.clip((base_y // 8) * 8, 0, yp - mspec.by8)
        base_z = jnp.clip(blo[:, 2] - 1, 0, gd_ + 2 - mspec.szzc)
        return jnp.stack([base_z, by8, xb0, active], axis=1)

    bases = jax.lax.map(per_s, jnp.arange(n_seg, dtype=jnp.int32))
    # SMEM blocks need their trailing dims equal to the array's: flatten
    # (T, S, 4) -> (T*S, 1, 4) and index blocks as t*S + s
    bases = bases.transpose(1, 0, 2).reshape(n_tiles * n_seg, 1, 4)
    return bases, k0t.reshape(n_tiles, 1, 1)


def _build_samples(rays, k0, sf, *, seg, tile, stepsize, box_min,
                   box_size, has_direction):
    """Lattice positions for one (tile, segment) program. rays: (8,
    tile) packet [start*3, dir*3, k0_ray, tmax]. Returns (kk (1, N),
    tval (1, N), x (3, N), dirs (3, N)|None)."""
    k0_ray = rays[6:7, :]
    kk = jnp.concatenate(
        [k0_ray * 0.0 + (k0 + sf * seg + jnp.float32(jj))
         for jj in range(seg)], axis=1)           # (1, N)
    tval = kk * stepsize
    xs = []
    ds = []
    for c in range(3):
        sc = jnp.concatenate([rays[c:c + 1, :]] * seg, axis=1)
        dc = jnp.concatenate([rays[3 + c:4 + c, :]] * seg, axis=1)
        ds.append(dc)
        xs.append((sc + tval * dc - box_min[c]) / box_size[c])
    x = jnp.concatenate(xs, axis=0)               # (3, N)
    dirs = jnp.concatenate(ds, axis=0) if has_direction else None
    return kk, tval, x, dirs


def _step_delta(rays, stepsize, box_size):
    """Per-ray normalized lattice step (3, tile) -- the fourier phase
    increment driver for :func:`fused_dvr._fourier_sincos_rot`."""
    return jnp.concatenate(
        [rays[3 + c:4 + c, :] * (float(stepsize) / float(box_size[c]))
         for c in range(3)], axis=0)


def _slab_parts(slab_ref, bases_ref, mspec: MegaSpec):
    """Dynamic-slice the certified sub-box window out of the resident
    slab and split it into per-x-block parts for the shared factorized
    trilerp resolve. Returns (parts, (bz, by8, xb0) i32 scalars)."""
    bz = bases_ref[0, 0, 0]
    by8 = pl.multiple_of(bases_ref[0, 0, 1], 8)
    xb0 = bases_ref[0, 0, 2]
    xoff = pl.multiple_of(xb0 * 128, 128)
    box = slab_ref[pl.ds(bz, mspec.szzc), pl.ds(by8, mspec.by8),
                   pl.ds(xoff, mspec.nxb * 128)]
    flat = box.astype(jnp.float32).reshape(mspec.wrows, mspec.nxb * 128)
    parts = [flat[:, p * 128:(p + 1) * 128] for p in range(mspec.nxb)]
    return parts, (bz, by8, xb0)


def _grouped_lat(x, slab_ref, basesf_ref, mspec_f: MegaSpec, groups: int,
                 grid_sizes, compute_dtype):
    """Group-windowed boxfeat resolve (the round-3 sub-window lever,
    PERF.md): each seg/groups-step group of lanes resolves against its
    own FINE certified window sliced from the resident slab, so the
    resolve matmuls' K dim shrinks from the whole segment's (z, y8)
    footprint to the group footprint (usually one K<=64 MXU pass) and
    the wzy Khatri-Rao build shrinks with it. Returns (lat (16, N),
    [aux_g], [(bz, by8, xoff)_g]) -- the per-group aux/window feed the
    backward's transposed accumulation."""
    n = x.shape[1]
    ng = n // groups
    f32 = jnp.float32
    feats, auxs, winds = [], [], []
    for g in range(groups):
        bz = basesf_ref[g, 0, 0]
        by8 = pl.multiple_of(basesf_ref[g, 0, 1], 8)
        xb0 = basesf_ref[g, 0, 2]
        xoff = pl.multiple_of(xb0 * 128, 128)
        box = slab_ref[pl.ds(bz, mspec_f.szzc), pl.ds(by8, mspec_f.by8),
                       pl.ds(xoff, mspec_f.nxb * 128)]
        flat = box.astype(f32).reshape(mspec_f.wrows, mspec_f.nxb * 128)
        parts = [flat[:, p_ * 128:(p_ + 1) * 128]
                 for p_ in range(mspec_f.nxb)]
        feat_g, aux_g = _boxfeat_features_parts(
            x[:, g * ng:(g + 1) * ng], parts, by8.astype(f32),
            bz.astype(f32), xb0.astype(f32), spec_t=mspec_f.wspec,
            grid_sizes=grid_sizes, compute_dtype=compute_dtype)
        feats.append(feat_g)
        auxs.append(aux_g)
        winds.append((bz, by8, xoff))
    return jnp.concatenate(feats, axis=1), auxs, winds


def _mega_fwd_kernel(k0t_ref, bases_ref, rays_ref, *refs,
                     n_hidden: int, activation: str, act_param: float,
                     output_mode: str, has_latent: bool,
                     grid_sizes: tuple, mspec: Optional[MegaSpec],
                     tf_points: int, blend_beer: bool,
                     seg: int, tile: int,
                     density_min: float, density_max: float,
                     stepsize: float, early_alpha: float,
                     box_min: tuple, box_size: tuple,
                     compute_dtype, has_direction: bool,
                     differentiable: bool,
                     need_normals: bool = False, brdf: tuple = (),
                     tf_mode: str = "piecewise", tf_pre_rows: int = 0,
                     iso_value=None,
                     resolve_groups: int = 1,
                     mspec_fine: Optional[MegaSpec] = None,
                     want_ray_grads: bool = False):
    """One (ray-tile, segment) program of the megakernel forward
    (``want_ray_grads`` only affects the backward)."""
    if resolve_groups > 1:
        basesf_ref = refs[0]
        refs = refs[1:]
    if has_latent:
        slab_ref = refs[0]
        refs = refs[1:]
    (fourier_ref, fdir_ref, w1pos_ref, w1dir_ref, w1cos_ref, w1sin_ref,
     w1lat_ref, b1_ref) = refs[0:8]
    rest = refs[8:]
    hw = rest[:n_hidden]
    hb = rest[n_hidden:2 * n_hidden]
    wout_ref = rest[2 * n_hidden]
    bout_ref = rest[2 * n_hidden + 1]
    tf_ref = rest[2 * n_hidden + 2]
    out_ref = rest[2 * n_hidden + 3]
    carries_ref = rest[2 * n_hidden + 4] if differentiable else None

    s = pl.program_id(1)
    f32 = jnp.float32
    crows = 16 if need_normals else 8

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.concatenate(
            [jnp.zeros((4, tile), f32), jnp.full((1, tile), -1.0, f32),
             jnp.zeros((crows - 5, tile), f32)], axis=0)

    if differentiable:
        # stash the incoming carry for EVERY (tile, segment) program --
        # the backward replays the same saturation vote on it, so
        # early-out composes with the exact gated adjoint
        carries_ref[0] = out_ref[:]
    run = bases_ref[0, 0, 3] > 0
    if early_alpha < 1.5:
        # per-ray-tile saturation vote (the reference's warp-sync
        # early-out, renderer_ray_evaluation_stepping_dvr.cuh:93-99)
        run = run & (jnp.min(out_ref[3, :]) < early_alpha)

    @pl.when(run)
    def _body():
        carry = out_ref[:]
        rays = rays_ref[:]
        k0 = k0t_ref[0, 0, 0]
        sf = s.astype(f32)
        kk, tval, x, dirs = _build_samples(
            rays, k0, sf, seg=seg, tile=tile, stepsize=stepsize,
            box_min=box_min, box_size=box_size,
            has_direction=has_direction)
        lat = None
        bf_aux = None
        if has_latent and resolve_groups > 1:
            lat, _, _ = _grouped_lat(x, slab_ref, basesf_ref, mspec_fine,
                                     resolve_groups, grid_sizes,
                                     compute_dtype)
        elif has_latent:
            parts, (bz, by8, xb0) = _slab_parts(slab_ref, bases_ref,
                                                mspec)
            lat, bf_aux = _boxfeat_features_parts(
                x, parts, by8.astype(f32), bz.astype(f32),
                xb0.astype(f32), spec_t=mspec.wspec,
                grid_sizes=grid_sizes, compute_dtype=compute_dtype)
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
            want_pack=need_normals,
            fourier_rot=(seg, _step_delta(rays, stepsize, box_size)))
        out_ref[:] = _march_epilogue(
            value=value, dv_dy=dv_dy, pack=pack, rows_t=bf_aux, x=x,
            rays=rays, tval=tval, kk=kk, carry=carry,
            fourier=fourier_ref[:], w1pos=w1pos_ref[:],
            w1cos=w1cos_ref[:], w1sin=w1sin_ref[:],
            w1lat=w1lat_ref[:] if has_latent else None,
            hw=[w[:] for w in hw], w_out=wout_ref[:], tf=tf_ref,
            activation=activation, act_param=act_param,
            output_mode=output_mode, has_latent=has_latent,
            has_latent_table=False,
            latent_boxfeat=(mspec.wspec if has_latent else ()),
            grid_sizes=grid_sizes, tf_points=tf_points,
            tf_pre_rows=tf_pre_rows, tf_mode=tf_mode,
            blend_beer=blend_beer, seg=seg, tile=tile,
            density_min=density_min, density_max=density_max,
            stepsize=stepsize, box_min=box_min, box_size=box_size,
            compute_dtype=compute_dtype, need_normals=need_normals,
            brdf=brdf, iso_value=iso_value, lattice=True)


def _mega_bwd_kernel(k0t_ref, bases_ref, rays_ref, *refs,
                     n_hidden: int, activation: str, act_param: float,
                     output_mode: str, has_latent: bool,
                     grid_sizes: tuple, mspec: Optional[MegaSpec],
                     tf_points: int, blend_beer: bool,
                     seg: int, tile: int, n_seg: int,
                     density_min: float, density_max: float,
                     stepsize: float, early_alpha: float,
                     box_min: tuple, box_size: tuple,
                     compute_dtype, has_direction: bool,
                     resolve_groups: int = 1,
                     mspec_fine: Optional[MegaSpec] = None,
                     want_ray_grads: bool = False,
                     tf_mode: str = "piecewise",
                     tf_pre_rows: int = 0):
    """Backward of one (ray-tile, segment) program, segments visited in
    REVERSE (the incoming-carry cotangent chains through the dcarry
    scratch). Latent-grid gradients accumulate into the dtab scratch
    slab; weight/TF gradients into revisited output blocks."""
    if resolve_groups > 1:
        basesf_ref = refs[0]
        refs = refs[1:]
    if has_latent:
        slab_ref = refs[0]
        refs = refs[1:]
    carries_ref, dout_ref = refs[0], refs[1]
    (fourier_ref, fdir_ref, w1pos_ref, w1dir_ref, w1cos_ref, w1sin_ref,
     w1lat_ref, b1_ref) = refs[2:10]
    rest = refs[10:]
    hw = rest[:n_hidden]
    hb = rest[n_hidden:2 * n_hidden]
    wout_ref = rest[2 * n_hidden]
    bout_ref = rest[2 * n_hidden + 1]
    tf_ref = rest[2 * n_hidden + 2]
    outs = rest[2 * n_hidden + 3:]
    if has_latent:
        dslab_ref = outs[0]
        outs = outs[1:]
    (dfourier_ref, dfdir_ref, dw1pos_ref, dw1dir_ref, dw1cos_ref,
     dw1sin_ref, dw1lat_ref, db1_ref) = outs[0:8]
    dhw = outs[8:8 + n_hidden]
    dhb = outs[8 + n_hidden:8 + 2 * n_hidden]
    dwout_ref = outs[8 + 2 * n_hidden]
    dbout_ref = outs[8 + 2 * n_hidden + 1]
    dtf_ref = outs[8 + 2 * n_hidden + 2]
    k_out = 8 + 2 * n_hidden + 3
    drays_ref = None
    if want_ray_grads:
        drays_ref = outs[k_out]
        k_out += 1
    scratch = outs[k_out:]
    dcarry_s = scratch[0]
    dtab_acc = scratch[1] if has_latent else None

    t = pl.program_id(0)
    si = pl.program_id(1)
    n_t = pl.num_programs(0)
    f32 = jnp.float32
    first = (t == 0) & (si == 0)
    grad_refs = (dfourier_ref, dfdir_ref, dw1pos_ref, dw1dir_ref,
                 dw1cos_ref, dw1sin_ref, dw1lat_ref, db1_ref, tuple(dhw),
                 tuple(dhb), dwout_ref, dbout_ref, dtf_ref)

    # init OUTSIDE the active guard: the first program may be inactive
    @pl.when(first)
    def _init():
        for r in grad_refs[:8] + grad_refs[10:12]:
            r[:] = jnp.zeros_like(r)
        for r in grad_refs[8] + grad_refs[9]:
            r[:] = jnp.zeros_like(r)
        if tf_mode in ("texture", "preint1d", "preint2d"):
            dtf_ref[:] = jnp.zeros_like(dtf_ref)   # VMEM array accum
        else:
            for k in range(tf_points):
                for c in range(8):
                    dtf_ref[k, c] = f32(0.0)
        if has_latent:
            dtab_acc[:] = jnp.zeros_like(dtab_acc)

    @pl.when(si == 0)
    def _seed():
        dcarry_s[:] = dout_ref[:]
        if want_ray_grads:
            drays_ref[:] = jnp.zeros_like(drays_ref)

    run = bases_ref[0, 0, 3] > 0
    if early_alpha < 1.5:
        # replay the forward's per-tile saturation vote on the STORED
        # incoming carry -- the adjoint gates exactly where the forward
        # gated (skipped segments pass dcarry through unchanged)
        run = run & (jnp.min(carries_ref[0, 3, :]) < early_alpha)

    @pl.when(run)
    def _body():
        rays = rays_ref[:]
        k0 = k0t_ref[0, 0, 0]
        sf = (n_seg - 1 - si).astype(f32)
        kk, tval, x, dirs = _build_samples(
            rays, k0, sf, seg=seg, tile=tile, stepsize=stepsize,
            box_min=box_min, box_size=box_size,
            has_direction=has_direction)
        lat = None
        bf_aux = None
        auxs = winds = None
        if has_latent and resolve_groups > 1:
            lat, auxs, winds = _grouped_lat(
                x, slab_ref, basesf_ref, mspec_fine, resolve_groups,
                grid_sizes, compute_dtype)
        elif has_latent:
            parts, (bz, by8, xb0) = _slab_parts(slab_ref, bases_ref,
                                                mspec)
            lat, bf_aux = _boxfeat_features_parts(
                x, parts, by8.astype(f32), bz.astype(f32),
                xb0.astype(f32), spec_t=mspec.wspec,
                grid_sizes=grid_sizes, compute_dtype=compute_dtype)
        weight_refs = (fourier_ref, fdir_ref, w1pos_ref, w1dir_ref,
                       w1cos_ref, w1sin_ref, w1lat_ref, b1_ref,
                       tuple(hw), tuple(hb), wout_ref, bout_ref, tf_ref)
        d_lat, dcarry_rows, d_ray_mlp = bwd_segment_core(
            x=x, dirs=dirs, lat=lat, carry=carries_ref[0],
            dcarry=dcarry_s[:], tval=tval, kk=kk,
            tmin=rays[6:7, :], tmax=rays[7:8, :],
            weight_refs=weight_refs, grad_refs=grad_refs,
            first=first & False,   # init handled above
            stash=None,
            n_hidden=n_hidden, activation=activation,
            act_param=act_param, output_mode=output_mode,
            has_latent=has_latent, tf_points=tf_points,
            blend_beer=blend_beer, seg=seg, tile=tile,
            density_min=density_min, density_max=density_max,
            stepsize=stepsize, early_alpha=2.0,
            compute_dtype=compute_dtype, has_direction=has_direction,
            latent_boxfeat=True,
            fourier_rot=(seg, _step_delta(rays, stepsize, box_size)),
            want_ray_grads=want_ray_grads, tf_mode=tf_mode,
            tf_pre_rows=tf_pre_rows)
        dcarry_s[:] = dcarry_rows
        cd = compute_dtype
        if want_ray_grads:
            # reverse-mode ray gradients: fold the per-sample position
            # cotangent (MLP-input chain from bwd_segment_core + the
            # boxfeat trilerp-weight term) over the segment's steps into
            # d_ray_start / d_ray_dir rows (the fused analog of the
            # reference's differentiable camera, camera.h:15-225):
            #   x = (start + t*dir - bmin)/bsize
            #   d_start = sum_k d_x_k / bsize
            #   d_dir   = sum_k d_x_k * t_k / bsize (+ direction input)
            from .fused_dvr import _boxfeat_dx
            d_x, d_dirs = d_ray_mlp
            if has_latent and resolve_groups > 1:
                ngr = d_lat.shape[1] // resolve_groups
                d_x = d_x + jnp.concatenate(
                    [_boxfeat_dx(auxs[g], d_lat[:, g * ngr:(g + 1) * ngr],
                                 mspec_fine.wspec, grid_sizes, cd)
                     for g in range(resolve_groups)], axis=1)
            elif has_latent:
                d_x = d_x + _boxfeat_dx(bf_aux, d_lat, mspec.wspec,
                                        grid_sizes, cd)
            rows_out = []
            for c in range(3):
                acc = jnp.zeros((1, tile), f32)
                for j in range(seg):
                    acc = acc + d_x[c:c + 1, j * tile:(j + 1) * tile]
                rows_out.append(acc * (1.0 / box_size[c]))
            for c in range(3):
                acc = jnp.zeros((1, tile), f32)
                for j in range(seg):
                    sl = (slice(c, c + 1),
                          slice(j * tile, (j + 1) * tile))
                    acc = acc + d_x[sl] * tval[0:1,
                                               j * tile:(j + 1) * tile]
                acc = acc * (1.0 / box_size[c])
                if d_dirs is not None:
                    for j in range(seg):
                        acc = acc + d_dirs[c:c + 1,
                                           j * tile:(j + 1) * tile]
                rows_out.append(acc)
            rows_out.append(jnp.zeros((2, tile), f32))
            drays_ref[:] = drays_ref[:] + jnp.concatenate(rows_out,
                                                          axis=0)
        if has_latent and "dtab" in _fd._ABLATE:  # timing-only fake
            pass
        elif has_latent and resolve_groups > 1:
            # grouped transposed accumulation: each group's cotangent
            # lands in its own FINE window (sequential RMW within one
            # program handles overlapping group windows correctly)
            ng = d_lat.shape[1] // resolve_groups
            for g in range(resolve_groups):
                aux_g = auxs[g]
                bz, by8, xoff = winds[g]
                d_g = d_lat[:, g * ng:(g + 1) * ng]
                wzy_c = aux_g.wzy.astype(cd)
                parts_d = []
                for p_ in range(mspec_fine.nxb):
                    dm1 = jnp.concatenate(
                        [aux_g.wx[p_ * 8 + rr:p_ * 8 + rr + 1, :] * d_g
                         for rr in range(8)], axis=0)    # (128, Ng)
                    parts_d.append(jax.lax.dot_general(
                        wzy_c, dm1.astype(cd),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=f32))     # (WROWSf, 128)
                dbox3 = jnp.concatenate(parts_d, axis=1).reshape(
                    mspec_fine.szzc, mspec_fine.by8,
                    mspec_fine.nxb * 128)
                ix = (pl.ds(bz, mspec_fine.szzc),
                      pl.ds(by8, mspec_fine.by8),
                      pl.ds(xoff, mspec_fine.nxb * 128))
                dtab_acc[ix] = dtab_acc[ix] + dbox3
        elif has_latent:
            # factorized trilerp transpose per x-block, assembled into
            # the (szzc, by8, nxb*128) window and accumulated into the
            # resident gradient slab -- the in-kernel scatter
            parts_d = []
            wzy_c = bf_aux.wzy.astype(cd)
            for p_ in range(mspec.nxb):
                dm1 = jnp.concatenate(
                    [bf_aux.wx[p_ * 8 + rr:p_ * 8 + rr + 1, :] * d_lat
                     for rr in range(8)], axis=0)        # (128, N)
                parts_d.append(jax.lax.dot_general(
                    wzy_c, dm1.astype(cd), (((1,), (1,)), ((), ())),
                    preferred_element_type=f32))         # (WROWS, 128)
            dbox = jnp.concatenate(parts_d, axis=1)
            dbox3 = dbox.reshape(mspec.szzc, mspec.by8,
                                 mspec.nxb * 128)
            bz = bases_ref[0, 0, 0]
            by8 = pl.multiple_of(bases_ref[0, 0, 1], 8)
            xoff = pl.multiple_of(bases_ref[0, 0, 2] * 128, 128)
            ix = (pl.ds(bz, mspec.szzc), pl.ds(by8, mspec.by8),
                  pl.ds(xoff, mspec.nxb * 128))
            dtab_acc[ix] = dtab_acc[ix] + dbox3

    if has_latent:
        @pl.when((t == n_t - 1) & (si == n_seg - 1))
        def _flush():
            dslab_ref[:] = dtab_acc[:].astype(dslab_ref.dtype)


def _mega_statics(*, weights, net, mspec, grid_sizes, tf_points,
                  blend_mode, seg, tile, density_min, density_max,
                  stepsize, bmin_t, bsize_t, compute_dtype, has_latent,
                  resolve_groups=1, mspec_fine=None,
                  want_ray_grads=False):
    return dict(
        resolve_groups=resolve_groups,
        mspec_fine=mspec_fine,
        want_ray_grads=want_ray_grads,
        n_hidden=len(weights.hidden_w),
        activation=net.layers[0].activation,
        act_param=net.layers[0].activation_param,
        output_mode=net.output_mode,
        has_latent=has_latent,
        grid_sizes=grid_sizes,
        mspec=mspec,
        tf_points=tf_points,
        blend_beer=(blend_mode == "beer_lambert"),
        seg=seg, tile=tile,
        density_min=float(density_min), density_max=float(density_max),
        stepsize=float(stepsize),
        box_min=bmin_t, box_size=bsize_t,
        compute_dtype=compute_dtype,
        has_direction=net.input.has_direction,
    )


def _mega_bwd_statics(statics: dict) -> dict:
    """The backward kernel's statics: the differentiable mode matrix
    (density/rgbo outputs x piecewise/texture TFs -- ``tf_mode`` rides
    through to bwd_segment_core); normals/shading/iso/preintegration
    extras are forward-only and guarded in mega_trace_dvr."""
    return {k: v for k, v in statics.items()
            if k not in ("need_normals", "brdf", "iso_value")}


def _const_spec(w):
    return pl.BlockSpec(w.shape, (lambda t, s, nd=w.ndim: (0,) * nd),
                        memory_space=pltpu.VMEM)


def mega_trace_dvr(ray_start: Array, ray_dir: Array,
                   net: SceneRepresentationNetwork,
                   box_min, box_size, tf_tensor: Array, *,
                   stepsize: float, max_steps: int,
                   seg: int = 32, tile: int = 256,
                   density_min: float = 0.0, density_max: float = 1.0,
                   blend_mode: str = "beer_lambert",
                   alpha_early_out: float = 0.999,
                   enable_early_out: bool = True,
                   compute_dtype=jnp.float32,
                   differentiable: bool = False,
                   table_dtype=jnp.float32,
                   subbox=0,
                   time=0.0, ensemble=0.0,
                   tmax_clip: Optional[Array] = None,
                   tmin_clip: Optional[Array] = None,
                   need_normals: bool = False,
                   brdf=None,
                   tf_mode: str = "piecewise",
                   tf_pre: Optional[Array] = None,
                   iso_value=None,
                   resolve_groups: int = 1,
                   subbox_fine=0,
                   ray_grads: bool = False,
                   segment_active: Optional[Array] = None,
                   interpret: bool = False) -> Array:
    """Fused DVR through an SRN as ONE pallas_call (see module doc).

    ``segment_active``: optional (n_tiles, n_seg) bool/int mask ANDed
    into the per-(tile, segment) active flags -- TF-aware empty-space
    skipping (ops/occupancy.make_segment_occupancy): segments whose
    density range maps below the opacity threshold are culled BEFORE
    the latent resolve/MLP/TF run (the trained-scene economics of the
    reference's early-outs, renderer_ray_evaluation_stepping_dvr.cuh:
    84-154). Applies to forward AND backward (the backward shares the
    bases); image error is bounded by the occupancy threshold, skipped
    samples' parameter gradients are dropped -- a render-path
    optimization, opt-in for training.

    Drop-in for :func:`fused_dvr.fused_trace_dvr` with
    ``latent_mode="boxfeat"`` semantics (lattice-aligned sampling;
    oracle: ``trace_dvr(..., lattice=True)``): same certified footprint
    (``subbox`` = a :class:`BoxfeatSpec`, or 0/"auto" to certify from
    concrete rays), same gradients (weights, TF, latent grid). Requires
    the padded latent slab to fit in VMEM (~<= 6 MB; the fV-SRN 32^3 x
    16ch grid is 1.5 MB bf16) -- larger grids use the per-segment
    engine. Returns rgba (R, 4).
    """
    r_total = ray_start.shape[0]
    dtype = jnp.float32
    try:
        bmin_t = tuple(float(v) for v in np.asarray(box_min))
        bsize_t = tuple(float(v) for v in np.asarray(box_size))
    except Exception as e:
        raise ValueError("mega_trace_dvr requires concrete box_min/"
                         "box_size") from e
    rgbo = not net.output_mode.startswith("density")
    if differentiable and (need_normals or iso_value is not None
                           or (tf_mode not in ("piecewise", "texture",
                                               "gaussian", "preint1d",
                                               "preint2d")
                               and not rgbo)):
        raise NotImplementedError(
            "megakernel backward: density/rgbo outputs x every TF mode "
            "(piecewise/texture/gaussian/preint1d/preint2d); "
            "normals/shading/iso losses train through the plain-JAX "
            "oracle)")
    if iso_value is not None and (need_normals or rgbo):
        raise ValueError("fused iso marching: forward-only density "
                         "networks (shading happens outside the kernel)")
    if need_normals and rgbo:
        raise ValueError("normals are only defined for density networks")
    ray_start = jnp.asarray(ray_start, dtype)
    ray_dir = jnp.asarray(ray_dir, dtype)
    if r_total % tile != 0:
        raise ValueError(f"ray count {r_total} must be a multiple of "
                         f"tile={tile}")
    box_min_a = jnp.asarray(np.asarray(box_min), dtype)
    box_size_a = jnp.asarray(np.asarray(box_size), dtype)
    tmin, tmax = intersect_aabb(ray_start, ray_dir, box_min_a, box_size_a)
    tmin = jnp.maximum(tmin, 0.0)
    if tmax_clip is not None:
        # saturation-clamped march (probe_saturation_tmax): exactly the
        # reference's early-out truncation, decided at plan time
        tmax = jnp.minimum(tmax, jnp.asarray(tmax_clip, dtype)
                           .reshape(tmax.shape))
    if tmin_clip is not None:
        # entry empty-space clip (probe_entry_tmin): advance each ray's
        # lattice base past its leading transparent prefix -- bases,
        # active flags, and footprints all derive from k0_ray, so the
        # whole march shrinks from the front consistently with a
        # tmin_clip-aware plan/certificate
        tmin = jnp.maximum(tmin, jnp.asarray(tmin_clip, dtype)
                           .reshape(tmin.shape))
    k0_ray = jnp.ceil(tmin / stepsize)

    # 1D latent vectors fold into the first-layer bias at this frame's
    # (time, ensemble) (fused_dvr.extract_weights); grids stay per-sample
    weights = extract_weights(net, jnp.float32, time=time,
                              ensemble=ensemble)
    has_latent = weights.w1_lat is not None
    cl = weights.w1_lat.shape[1] if has_latent else 0
    if has_latent and cl > 16:
        raise NotImplementedError("megakernel: <= 16 latent channels")

    if resolve_groups > 1 and seg % resolve_groups:
        raise ValueError("resolve_groups must divide seg")
    if need_normals or not has_latent:
        # the adjoint-normal sweep consumes the whole-segment BoxfeatAux
        # (and without a latent grid there is nothing to window)
        resolve_groups = 1

    grid_sizes = (1, 1, 1)
    mspec = None
    mspec_fine = None
    slab = None
    nxb_tot = 0
    yp = 0
    if has_latent:
        latent_grid = jnp.asarray(resolve_grid(net.latent, time, ensemble),
                                  jnp.float32)
        _, gd, gh, gw = latent_grid.shape
        grid_sizes = (gw, gh, gd)
        if isinstance(subbox, BoxfeatSpec):
            bf_spec = subbox
        else:
            bf_spec = certify_boxfeat(
                ray_start, ray_dir, grid_sizes, box_min, box_size,
                stepsize=stepsize, max_steps=max_steps, seg=seg,
                tile=tile,
                tmax_clip=(np.asarray(tmax_clip)
                           if tmax_clip is not None else None),
                tmin_clip=(np.asarray(tmin_clip)
                           if tmin_clip is not None else None))
        mspec = _mega_spec(bf_spec)
        nxb_tot = (gw + 2 + 7) // 8
        by8max = max(0, ((gh + 2 - mspec.szyc) // 8) * 8)
        yp = max(-(-(gh + 2) // 8) * 8, by8max + mspec.by8)
        if resolve_groups > 1:
            if isinstance(subbox_fine, BoxfeatSpec):
                bf_fine = subbox_fine
            else:
                bf_fine = certify_boxfeat(
                    ray_start, ray_dir, grid_sizes, box_min, box_size,
                    stepsize=stepsize, max_steps=max_steps,
                    seg=seg // resolve_groups, tile=tile,
                    tmax_clip=(np.asarray(tmax_clip)
                               if tmax_clip is not None else None),
                    tmin_clip=(np.asarray(tmin_clip)
                               if tmin_clip is not None else None))
            mspec_fine = _mega_spec(bf_fine)
            # the fine windows' 8-aligned y bases can start later than
            # the coarse ones; pad the slab to cover both
            by8max_f = max(0, ((gh + 2 - mspec_fine.szyc) // 8) * 8)
            yp = max(yp, by8max_f + mspec_fine.by8)
        slab_bytes = (gd + 2) * yp * nxb_tot * 128 \
            * jnp.dtype(table_dtype).itemsize
        if slab_bytes > SLAB_VMEM_LIMIT:
            raise ValueError(
                f"megakernel: latent slab {slab_bytes / 2**20:.1f} MB "
                f"exceeds the VMEM budget; use the per-segment engine")
        slab = build_boxfeat_slab(latent_grid, nxb_tot, yp).astype(
            table_dtype)
        w1l = weights.w1_lat
        if cl < 16:
            w1l = jnp.concatenate(
                [w1l, jnp.zeros((w1l.shape[0], 16 - cl), w1l.dtype)],
                axis=1)
        weights = weights._replace(w1_lat=w1l)
        n_seg = mspec.n_seg
    else:
        n_seg = (max_steps + seg - 1) // seg

    n_tiles = r_total // tile
    tf_pad, tf_points, tf_pre_rows = _prepare_tf(tf_tensor, tf_mode,
                                                 tf_pre)
    crows = 16 if need_normals else 8
    statics = _mega_statics(
        weights=weights, net=net, mspec=mspec, grid_sizes=grid_sizes,
        tf_points=tf_points, blend_mode=blend_mode, seg=seg, tile=tile,
        density_min=density_min, density_max=density_max,
        stepsize=stepsize, bmin_t=bmin_t, bsize_t=bsize_t,
        compute_dtype=compute_dtype, has_latent=has_latent,
        resolve_groups=resolve_groups, mspec_fine=mspec_fine,
        want_ray_grads=(ray_grads and differentiable))
    statics.update(need_normals=need_normals,
                   brdf=_brdf_tuple(brdf, need_normals),
                   tf_mode=tf_mode, tf_pre_rows=tf_pre_rows,
                   iso_value=(float(iso_value)
                              if iso_value is not None else None))

    sa = None
    if segment_active is not None:
        # may be traced (the product path feeds per-camera masks as jit
        # arguments so quantize-stabilized plans share one program); a
        # certified spec may march fewer segments than ceil(max_steps /
        # seg) -- extra mask columns are simply unused
        sa = jnp.asarray(segment_active).astype(jnp.int32)
        if sa.shape[0] != r_total // tile or sa.shape[1] < n_seg:
            raise ValueError(
                f"segment_active shape {sa.shape} incompatible with "
                f"(n_tiles, >=n_seg) = {(r_total // tile, n_seg)}")
    bases, k0t = _mega_bases(
        ray_start, ray_dir, k0_ray, tmax, n_seg=n_seg, seg=seg,
        stepsize=stepsize, tile=tile, has_latent=has_latent,
        grid_sizes=grid_sizes, box_min=box_min, box_size=box_size,
        mspec=mspec, nxb_tot=nxb_tot, yp=yp, segment_active=sa)
    basesf = None
    if resolve_groups > 1:
        # FINE window bases: the same prologue at sub-segment (seg/G
        # step) granularity; row t*(S*G) + s*G + g is segment s, group g
        basesf, _ = _mega_bases(
            ray_start, ray_dir, k0_ray, tmax, n_seg=n_seg * resolve_groups,
            seg=seg // resolve_groups, stepsize=stepsize, tile=tile,
            has_latent=has_latent, grid_sizes=grid_sizes, box_min=box_min,
            box_size=box_size, mspec=mspec_fine, nxb_tot=nxb_tot, yp=yp)
    rays_packet = jnp.concatenate(
        [ray_start.T, ray_dir.T, k0_ray.T, tmax.T], axis=0)   # (8, R)

    wlist = _weight_list(weights, tf_pad)
    in_specs = [
        pl.BlockSpec((1, 1, 1), lambda t, s: (t, 0, 0),
                     memory_space=pltpu.SMEM),                 # k0t
        pl.BlockSpec((1, 1, 4), lambda t, s, S=n_seg: (t * S + s, 0, 0),
                     memory_space=pltpu.SMEM),                 # bases
        pl.BlockSpec((8, tile), lambda t, s: (0, t),
                     memory_space=pltpu.VMEM),                 # rays
    ]
    ins = [k0t, bases, rays_packet]
    if resolve_groups > 1:
        # block (t*S+s) of G rows = this segment's group windows
        in_specs.append(pl.BlockSpec(
            (resolve_groups, 1, 4),
            lambda t, s, S=n_seg: (t * S + s, 0, 0),
            memory_space=pltpu.SMEM))                          # basesf
        ins.append(basesf)
    if has_latent:
        in_specs.append(_const_spec(slab))
        ins.append(slab)
    in_specs += [_const_spec(w) for w in wlist]

    out_spec = pl.BlockSpec((crows, tile), lambda t, s: (0, t),
                            memory_space=pltpu.VMEM)
    early = float(alpha_early_out) if enable_early_out else 2.0

    if not differentiable:
        kernel = functools.partial(_mega_fwd_kernel, early_alpha=early,
                                   differentiable=False, **statics)
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_seg),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((crows, r_total), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=interpret,
        )
        carry = call(*ins, *wlist)
        if need_normals:
            from ..raytracer.dvr import RayEvaluationOutput
            return RayEvaluationOutput(color=carry[:4].T,
                                       normal=carry[5:8].T,
                                       depth=carry[8:9].T)
        return carry[:4].T

    op = _make_mega_op(statics=_mega_bwd_statics(statics),
                       n_tiles=n_tiles, n_seg=n_seg,
                       r_total=r_total, tile=tile, in_specs=in_specs,
                       out_spec=out_spec, wlist_shapes=wlist,
                       has_latent=has_latent,
                       slab_shape=(slab.shape if has_latent else None),
                       slab_dtype=table_dtype, n_hidden=len(
                           weights.hidden_w),
                       early_alpha=early,
                       resolve_groups=resolve_groups,
                       want_ray_grads=(ray_grads and differentiable),
                       interpret=interpret)
    carry = op(k0t, bases, basesf, rays_packet, slab, weights, tf_pad)
    return carry[:4].T


def _make_mega_op(*, statics, n_tiles, n_seg, r_total, tile, in_specs,
                  out_spec, wlist_shapes, has_latent, slab_shape,
                  slab_dtype, n_hidden, early_alpha=2.0,
                  resolve_groups=1, want_ray_grads=False, interpret):
    """custom-VJP megakernel op: forward emits the per-(tile, segment)
    incoming carries; backward is one reverse-order megakernel call.
    ``early_alpha < 1.5`` enables the per-tile saturation vote in BOTH
    directions (the backward re-votes on the stored carries), so the
    adjoint differentiates exactly the gated function the forward
    computes -- the round-1 fwd/bwd gating mismatch cannot recur."""
    dtype = jnp.float32
    carries_spec = pl.BlockSpec((1, 8, tile), lambda t, s: (s, 0, t),
                                memory_space=pltpu.VMEM)
    kernel_fwd = functools.partial(_mega_fwd_kernel,
                                   early_alpha=early_alpha,
                                   differentiable=True, **statics)
    fwd_call = pl.pallas_call(
        kernel_fwd,
        grid=(n_tiles, n_seg),
        in_specs=in_specs,
        out_specs=(out_spec, carries_spec),
        out_shape=(jax.ShapeDtypeStruct((8, r_total), dtype),
                   jax.ShapeDtypeStruct((n_seg, 8, r_total), dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )

    kernel_bwd = functools.partial(_mega_bwd_kernel, n_seg=n_seg,
                                   early_alpha=early_alpha, **statics)
    n_lead = 3 + (1 if resolve_groups > 1 else 0) \
        + (1 if has_latent else 0)
    bwd_in_specs = list(in_specs[:n_lead]) + [
        pl.BlockSpec((1, 8, tile), lambda t, s: (n_seg - 1 - s, 0, t),
                     memory_space=pltpu.VMEM),                # carries
        pl.BlockSpec((8, tile), lambda t, s: (0, t),
                     memory_space=pltpu.VMEM),                # d_out
    ] + list(in_specs[n_lead:])
    # bases (and the fine group bases) must be read at the REVERSED
    # segment index
    bwd_in_specs[1] = pl.BlockSpec(
        (1, 1, 4), lambda t, s: (t * n_seg + (n_seg - 1 - s), 0, 0),
        memory_space=pltpu.SMEM)
    if resolve_groups > 1:
        bwd_in_specs[3] = pl.BlockSpec(
            (resolve_groups, 1, 4),
            lambda t, s: (t * n_seg + (n_seg - 1 - s), 0, 0),
            memory_space=pltpu.SMEM)

    out_specs = []
    out_shapes = []
    if has_latent:
        out_specs.append(pl.BlockSpec(
            slab_shape, lambda t, s: (0, 0, 0),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(slab_shape, slab_dtype))
    out_specs += [_const_spec(w) for w in wlist_shapes[:-1]] + [
        # d_tf: scalar SMEM accumulation for the few-point piecewise
        # TF; the texture table accumulates as a VMEM array (one MXU
        # contraction per program, bwd_segment_core)
        pl.BlockSpec(wlist_shapes[-1].shape,
                     (lambda t, s, nd=wlist_shapes[-1].ndim:
                      (0,) * nd),
                     memory_space=(pltpu.VMEM
                                   if statics.get("tf_mode")
                                   in ("texture", "preint1d", "preint2d")
                                   else pltpu.SMEM))]         # d_tf
    out_shapes += [jax.ShapeDtypeStruct(w.shape, dtype)
                   for w in wlist_shapes]
    if want_ray_grads:
        out_specs.append(pl.BlockSpec((8, tile), lambda t, s: (0, t),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((8, r_total), dtype))
    scratch = [pltpu.VMEM((8, tile), dtype)]                  # dcarry
    if has_latent:
        scratch.append(pltpu.VMEM(slab_shape, dtype))         # dtab

    bwd_call = pl.pallas_call(
        kernel_bwd,
        grid=(n_tiles, n_seg),
        in_specs=bwd_in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )

    def _unpack_dw(dw, weights):
        (d_fourier, d_fdir, d_w1pos, d_w1dir, d_w1cos, d_w1sin,
         d_w1lat, d_b1) = dw[:8]
        k = 8
        d_hw = tuple(dw[k:k + n_hidden]); k += n_hidden
        d_hb = tuple(dw[k:k + n_hidden]); k += n_hidden
        d_wout, d_bout, d_tf = dw[k], dw[k + 1], dw[k + 2]
        d_weights = FusedWeights(
            fourier=d_fourier,
            fourier_dir=(d_fdir if weights.fourier_dir is not None
                         else None),
            w1_pos=d_w1pos,
            w1_dir=d_w1dir if weights.w1_dir is not None else None,
            w1_cos=d_w1cos, w1_sin=d_w1sin,
            w1_lat=d_w1lat if has_latent else None,
            b1=d_b1, hidden_w=d_hw, hidden_b=d_hb,
            w_out=d_wout, b_out=d_bout)
        return d_weights, d_tf

    def _args(k0t, bases, basesf, rays_packet, slab):
        return ([k0t, bases, rays_packet]
                + ([basesf] if resolve_groups > 1 else [])
                + ([slab] if has_latent else []))

    def op(k0t, bases, basesf, rays_packet, slab,
           weights: FusedWeights, tf_pad):
        wl = _weight_list(weights, tf_pad)
        return fwd_call(*_args(k0t, bases, basesf, rays_packet, slab),
                        *wl)[0]

    op = jax.custom_vjp(op)

    def op_fwd(k0t, bases, basesf, rays_packet, slab, weights, tf_pad):
        wl = _weight_list(weights, tf_pad)
        out, carries = fwd_call(
            *_args(k0t, bases, basesf, rays_packet, slab), *wl)
        return out, (k0t, bases, basesf, rays_packet, slab, weights,
                     tf_pad, carries)

    def op_bwd(res, d_out):
        (k0t, bases, basesf, rays_packet, slab, weights, tf_pad,
         carries) = res
        wl = _weight_list(weights, tf_pad)
        args = (_args(k0t, bases, basesf, rays_packet, slab)
                + [carries, d_out] + wl)
        outs = list(bwd_call(*args))
        if has_latent:
            d_slab = outs[0]
            outs = outs[1:]
        else:
            d_slab = None
        if want_ray_grads:
            d_rays = outs[-1]
            outs = outs[:-1]
        else:
            d_rays = jnp.zeros_like(rays_packet)
        d_weights, d_tf = _unpack_dw(outs, weights)
        return (jnp.zeros_like(k0t), jnp.zeros_like(bases),
                (jnp.zeros_like(basesf) if basesf is not None else None),
                d_rays, d_slab, d_weights, d_tf)

    op.defvjp(op_fwd, op_bwd)
    return op
