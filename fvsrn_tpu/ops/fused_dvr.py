"""Fused SRN DVR march: Pallas MXU kernel for fourier+MLP+TF+blending.

This is the TPU-native replacement for the reference's tensor-core renderer
(reference: renderer/renderer_volume_tensorcores.cuh -- warp-synchronous
fp16 wmma MLP evaluated per sample inside the ray-marching kernel, weights
staged to shared memory once per block :401-564, fourier features :768-808,
hidden layers :955-1033, output heads :1041-1161), rethought for the MXU:

- Instead of 32 samples/warp, the march is batched: a segment of S
  consecutive steps for a tile of R rays forms a sample matrix, so every
  MLP layer is one MXU matmul with all weights resident in VMEM. Sample
  positions in constant-step DVR are data-independent
  (pos = start + (tmin + i*h) * dir), which is what makes the batching
  legal -- only the *compositing* is sequential, and that runs as a cheap
  unrolled VPU loop at the end of the kernel.
- TRANSPOSED layout: activations are (channels, samples) with samples on
  the 128-lane axis and the (narrow) channel dims on sublanes. The naive
  (samples, channels) layout lane-pads every (N, 3)/(N, 32) tensor to 128
  lanes and blows the 16MB VMEM budget (measured: 24.7MB for an 8K-sample
  program); transposed, nothing is padded.
- The latent-grid trilerp stays OUTSIDE the kernel as an XLA gather
  (Mosaic's dynamic_gather only supports <=128-entry lane tables, measured
  on v5e); XLA pipelines the gather of segment s+1 against the kernel of
  segment s.
- The first layer's concat([pos, cos, sin, latent]) @ W is a sum of block
  matmuls (W split by input range), avoiding concatenation entirely.
- Early termination: segment-level while_loop with an "any ray alive"
  vote -- the reference does the same at warp granularity
  (KERNEL_SYNCHRONIZED_TRACING, renderer_ray_evaluation_stepping_dvr.cuh:
  93-99).

Sample ordering: global sample axis is tile-major then step-major:
column = i_tile*(seg*tile) + j*tile + ray, so each program reads one
contiguous lane block and per-step compositing slices contiguous lanes.

Supported configuration (per-segment engine): density AND rgbo output
modes; piecewise / texture / 1D- and 2D-preintegrated / gaussian TFs
evaluated in-kernel; alpha/Beer-Lambert blending; optional direction
input; adjoint normals + Lambert/Phong shading (``need_normals``/
``brdf``); static or time/ensemble-keyframed latent grids (pre-lerped
per frame); isosurface first-crossing (``iso_value``); per-ray
``tmax_clip``/``tmin_clip``. The differentiable backward covers
density AND rgbo outputs x piecewise/texture-LUT/gaussian/1D- and
2D-preintegrated TFs (fused_dvr_bwd); shaded losses (``need_normals``/
``brdf``/iso) differentiate via the plain JAX path in
fvsrn_tpu.raytracer.dvr.
1D latent time/ensemble VECTORS (interp1D conditioning) fold into the
first-layer bias at the frame's (time, ensemble)
(:func:`extract_weights`) -- fused, with exact vector gradients.
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

from ..models.latent import grid_sample_3d, resolve_grid
from ..models.srn import SceneRepresentationNetwork
from ..utils.vecmath import intersect_aabb

# perf-ablation seams (tools/ablate_mega_cost.py): names here gut the
# matching kernel section for TIMING-ONLY builds (results are wrong):
#   "l1mm"/"hidmm"   fake the first-layer / hidden matmuls
#   "fourier"/"act"  fake the fourier trig / activation transcendentals
#   "resolve"/"wzy"/"xfold"  fake the boxfeat trilerp stages
_ABLATE = frozenset()


class FusedWeights(NamedTuple):
    """Transposed-layout weights: every matrix maps column-samples,
    h_out = W @ h_in. First layer pre-split by input block."""
    fourier: Array          # (F, 3): f = fourier @ x [+ fourier_dir @ dir]
    fourier_dir: Optional[Array]  # (F, 3) direction block of B, or None
    w1_pos: Array           # (H, 3)
    w1_dir: Optional[Array]  # (H, 3) or None
    w1_cos: Array           # (H, F)
    w1_sin: Array           # (H, F)
    w1_lat: Optional[Array]  # (H, CL) or None
    b1: Array               # (H, 1)
    hidden_w: tuple         # tuple of (H, H)
    hidden_b: tuple         # tuple of (H, 1)
    w_out: Array            # (C_out, H); C_out = 1 (density) or 4 (rgbo)
    b_out: Array            # (C_out, 1)


def extract_weights(net: SceneRepresentationNetwork,
                    dtype=jnp.float32, time=0.0,
                    ensemble=0.0) -> FusedWeights:
    """Split the SRN's first layer by input block (pos/dir/cos/sin/latent),
    the fused-kernel analogue of the reference's weight export
    (reference: network.py:798-897 export_to_pyrenderer; direction input
    and rgbo output heads mirror renderer_volume_tensorcores.cuh:768-808,
    1041-1161). Torch Linear weights are already (out, in), which IS the
    transposed layout.

    1D latent time/ensemble VECTORS (interp1D conditioning,
    reference: network.py:723-773 + PytorchFunctions::interp1D) fold
    into the first-layer BIAS here: at one (time, ensemble) every
    sample sees the same interpolated vector z, so its contribution
    W_vec @ z is a constant pre-activation shift -- the fused kernels
    march with b1' = b1 + W_vec @ z and only the grid channels stay as
    per-sample latent inputs. Exact (the layer is affine), and AD
    chains d(b1') back to the vectors through interp1d."""
    assert net.input.fourier_matrix_time is None, \
        "fused: no time fourier (use keyframed latent grids)"
    assert not net.input.use_time_direct, "fused: no direct time input"
    has_dir = net.input.has_direction
    B = jnp.asarray(net.input.fourier_matrix, dtype)  # (F, 3|6)
    f = B.shape[0]
    fourier_dir = None
    if B.shape[1] == 6:
        fourier_dir = B[:, 3:6]
        B = B[:, 0:3]
    cl = net.latent.total_channels
    w1 = jnp.asarray(net.layers[0].weight, dtype)  # (H, Cin)
    b1 = jnp.asarray(net.layers[0].bias, dtype)[:, None]
    base = 6 if has_dir else 3
    w1_pos = w1[:, 0:3]
    w1_dir = w1[:, 3:6] if has_dir else None
    w1_cos = w1[:, base:base + f]
    w1_sin = w1[:, base + f:base + 2 * f]
    w1_lat = w1[:, base + 2 * f:] if cl > 0 else None
    lat = net.latent
    if w1_lat is not None and not lat.time_dependent and (
            lat.ensemble_vector is not None
            or lat.time_vector is not None):
        # fold the constant vector features into the bias (docstring);
        # channel order matches LatentSpace.evaluate: ensemble vector,
        # time vector, then grid channels
        from ..models.latent import interp1d
        zs = []
        if lat.ensemble_vector is not None:
            zs.append(interp1d(
                jnp.asarray(lat.ensemble_vector, dtype),
                jnp.reshape(jnp.asarray(ensemble, dtype),
                            (1, 1)))[0, :, 0])
        if lat.time_vector is not None:
            zs.append(interp1d(
                jnp.asarray(lat.time_vector, dtype),
                jnp.reshape(jnp.asarray(time, dtype), (1, 1)))[0, :, 0])
        z = jnp.concatenate(zs)
        nvec = z.shape[0]
        b1 = b1 + w1_lat[:, :nvec] @ z[:, None]
        w1_lat = w1_lat[:, nvec:] if cl > nvec else None
    hidden_w = tuple(jnp.asarray(l.weight, dtype)
                     for l in net.layers[1:-1])
    hidden_b = tuple(jnp.asarray(l.bias, dtype)[:, None]
                     for l in net.layers[1:-1])
    w_out = jnp.asarray(net.layers[-1].weight, dtype)   # (C_out, H)
    b_out = jnp.asarray(net.layers[-1].bias, dtype)[:, None]
    return FusedWeights(B, fourier_dir, w1_pos, w1_dir, w1_cos, w1_sin,
                        w1_lat, b1, hidden_w, hidden_b, w_out, b_out)


def build_neighborhood_table(grid: Array) -> Array:
    """Precompute the 8-corner neighborhood table for one-gather trilerp.

    grid: (C, D, H, W) latent grid (C <= 16; zero-padded to 16).
    Returns (Vb, 128) where Vb = (D+1)*(H+1)*(W+1); row for base corner
    b = (bz, by, bx) holds the 2x2x2 neighborhood as 8 blocks of 16
    channels, k = dz*4 + dy*2 + dx. Built over the edge-padded grid so
    border-clamp semantics (align_corners=False, padding border) fall out
    of the windowing. 8x memory for 8x fewer gathers and zero lane padding
    ((N, 128) gather results are exactly one vreg row wide) -- the
    measured XLA per-corner gather pads (N, 16) to (N, 128).
    """
    grid = jnp.asarray(grid, jnp.float32)
    c, d, h, w = grid.shape
    assert c <= 16, "neighborhood table supports <= 16 latent channels"
    if c < 16:
        grid = jnp.concatenate(
            [grid, jnp.zeros((16 - c, d, h, w), grid.dtype)], axis=0)
    p = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="edge")
    blocks = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                blocks.append(p[:, dz:dz + d + 1, dy:dy + h + 1,
                               dx:dx + w + 1])
    t = jnp.stack(blocks, axis=0)  # (8, 16, D+1, H+1, W+1)
    t = t.transpose(2, 3, 4, 0, 1)  # (D+1, H+1, W+1, 8, 16)
    return t.reshape((d + 1) * (h + 1) * (w + 1), 128)


# -- fast in-kernel trig ---------------------------------------------------
# Mosaic lowers jnp.sin/cos to a full-precision expansion that dominates the
# forward kernel (measured: 0.43s of a 0.57s kernel is the SnakeAlt cos at
# 512^2). Round-4 spelling: a FULL-PERIOD parametrization
# u = x/(2pi) - round(x/(2pi)) in [-0.5, 0.5] with odd/even polynomials of
# sin(2 pi u)/cos(2 pi u) fitted on Chebyshev nodes (degree 9/10, max error
# 5.9e-6 / 7.8e-7 on the period -- inside the fused-vs-plain 1e-4 contract).
# Versus the previous mod-pi Cody-Waite scheme this removes the entire
# quadrant sign-recovery chain (2nd floor + 3 arith + final sign multiply,
# ~5 of ~13 VPU ops per call) for one extra FMA of polynomial -- the act
# section is the largest VPU line of the trained-scene cost map (PERF.md
# round-3/4). The reference makes the same trade on the SFU (__sinf/__cosf
# half2 paths, renderer_activations.cuh). Inputs are bounded (|x| < ~1e3,
# fourier features and pre-activations); the f32 reduction keeps the angle
# error below ~6e-5 there.
_INV_TWO_PI = 0.15915494309189535

# sin(2 pi u) = u * poly(u^2), u in [-0.5, 0.5]; fitted max err 5.9e-6
_SINP = (6.283055999, -41.33122495, 81.36696825, -74.47881939, 32.78284816)
# cos(2 pi u) = poly(u^2); fitted max err 7.8e-7
_COSP = (0.9999992229, -19.73898277, 64.92873485, -85.27248905,
         58.79445908, -21.07745425)


def _period_reduce(x: Array) -> Array:
    # floor(u + 0.5), not jnp.round: round-half-to-even lowers to a
    # multi-op select chain on Mosaic (measured +40% whole-kernel);
    # the tie difference only moves the wrap point between u = -0.5 and
    # +0.5, where the periodic polynomials agree.
    u = x * _INV_TWO_PI
    return u - jnp.floor(u + 0.5)


def _sin_poly(u: Array) -> Array:
    t = u * u
    return u * (_SINP[0] + t * (_SINP[1] + t * (
        _SINP[2] + t * (_SINP[3] + t * _SINP[4]))))


def _cos_poly(u: Array) -> Array:
    t = u * u
    return _COSP[0] + t * (_COSP[1] + t * (_COSP[2] + t * (
        _COSP[3] + t * (_COSP[4] + t * _COSP[5]))))


def _fast_sincos(x: Array):
    """(sin x, cos x) via one shared period reduction; f32 in/out."""
    u = _period_reduce(x)
    return _sin_poly(u), _cos_poly(u)


def _fast_sin(x: Array) -> Array:
    """sin only: the cos polynomial chain is omitted at the source (not
    left to DCE) -- this is the hot path of Sine/Snake activations."""
    return _sin_poly(_period_reduce(x))


def _fast_cos(x: Array) -> Array:
    """cos only: the sin polynomial chain is omitted at the source (not
    left to DCE) -- this is the hot path of SnakeAlt activations."""
    return _cos_poly(_period_reduce(x))


def block_ray_permutation(width: int, height: int,
                          block_w: int = 16, block_h: int = 16):
    """Permutation regrouping row-major rays into (block_h x block_w)
    pixel blocks, so each fused-kernel ray tile is spatially coherent
    (the precondition for the sub-box latent path). Returns (perm, inv):
    ``rays[perm]`` is block-ordered; ``out[inv]`` restores row-major.
    """
    assert width % block_w == 0 and height % block_h == 0
    idx = np.arange(height * width).reshape(height, width)
    perm = (idx.reshape(height // block_h, block_h,
                        width // block_w, block_w)
            .transpose(0, 2, 1, 3).reshape(-1))
    inv = np.argsort(perm)
    return perm, inv


def choose_fused_config(*, hidden: int, n_layers: int, num_fourier: int,
                        latent_channels: int = 0,
                        table_dtype=jnp.float32,
                        latent_mode: str = "table",
                        differentiable: bool = True,
                        need_normals: bool = False,
                        vmem_budget_bytes: int = 104 * 2 ** 20):
    """Occupancy chooser: pick (seg, tile) for the fused kernel from the
    VMEM budget given the network shape -- the TPU analog of the
    reference's ``computeMaxWarps`` (volume_interpolation_network.cpp:
    987-1040, block size from the 48KB smem budget per network shape;
    swept by collect_possible_layers.py).

    VMEM model: bytes/sample = overhead_factor x explicit working set
    (latent gather row + fourier features + per-layer activation chains
    + epilogue temps). The overhead factor absorbs Mosaic's intermediate
    allocations; calibrated against FOUR on-device compile points
    (tools/calibrate_chooser.py, v5e, 112 MB vmem limit, f32 table,
    differentiable):

      32x4 seg=32 tile=512 (N=16384, raw=1520 B)  FITS
      64x4 seg=32 tile=384 (N=12288, raw=2288 B)  FITS
      64x4 seg=32 tile=512 (N=16384, raw=2288 B)  does NOT fit
      128x4 seg=16 tile=512 (N=8192, raw=3824 B)  FITS

    which brackets overhead in [3.0, 4.0); 3.6 splits the bracket and
    reproduces the measured 64x4 boundary exactly (chooser -> tile=384).
    Tile is additionally capped at 256: the measured THROUGHPUT plateau
    is at (32, 256) and tile=512 runs ~10% slower even when it fits
    (PERF.md shape sweep) -- the cap is a perf choice, not a fit limit.
    Raises ValueError when even the minimum program (seg=8, tile=128)
    exceeds the budget, mirroring the reference's "warps == 0" error.

    Returns (seg, tile).
    """
    table_bytes = jnp.dtype(table_dtype).itemsize
    lat = 0
    if latent_channels > 0:
        if latent_mode == "table":
            lat = 128 * table_bytes          # (N, 128) neighborhood rows
        else:                                 # boxfeat: per-tile sub-box,
            lat = 32                          # amortized over the tile
    act_chains = n_layers + 2 if (differentiable or need_normals) else 3
    raw = (lat
           + 4 * (2 * num_fourier + min(latent_channels, 16))
           + 4 * hidden * act_chains
           + 64)                              # TF/blend epilogue temps
    overhead = 3.6          # see docstring: bracketed [3.0, 4.0) by the
    #                         on-device compile points
    n_max = int(vmem_budget_bytes / (overhead * raw))
    seg = 32
    while seg > 8 and seg * 128 > n_max:
        seg //= 2
    tile = (n_max // seg) // 128 * 128
    tile = min(tile, 256)   # measured perf plateau (PERF.md)
    if tile < 128:
        raise ValueError(
            f"fused kernel does not fit: hidden={hidden} x {n_layers} "
            f"layers needs {overhead * raw * seg * 128 / 2**20:.0f} MB "
            f"at the minimum seg=8 x tile=128 program, budget is "
            f"{vmem_budget_bytes / 2**20:.0f} MB")
    return seg, tile


def certify_subbox(ray_start, ray_dir, grid_sizes, box_min, box_size, *,
                   stepsize: float, max_steps: int, seg: int, tile: int,
                   margin: int = 1):
    """Measure the exact per-(ray-tile, segment) corner footprint of the
    march and return per-axis sub-box sizes (szx, szy, szz) certified to
    cover it (+``margin`` cells of safety for float divergence between
    this numpy replay and the kernel's position math).

    The TPU analog of the reference's occupancy calculator
    (volume_interpolation_network.cpp:987-1040 computeMaxWarps): a
    host-side pre-pass that sizes the kernel's on-chip working set.
    Requires concrete (non-traced) rays.
    """
    rs = np.asarray(ray_start, np.float32)
    rd = np.asarray(ray_dir, np.float32)
    bmin = np.asarray(box_min, np.float32)
    bsize = np.asarray(box_size, np.float32)
    res = np.asarray(grid_sizes, np.int32)          # (x, y, z)
    r_total = rs.shape[0]
    n_tiles = r_total // tile
    # numpy replay of intersect_aabb (utils/vecmath.py)
    inv = 1.0 / np.where(rd == 0, 1e-12, rd)
    t0 = (bmin - rs) * inv
    t1 = (bmin + bsize - rs) * inv
    tmin = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
    n_seg = (max_steps + seg - 1) // seg
    sz = np.ones(3, np.int64)
    for s in range(n_seg):
        t = tmin[:, None] + (s * seg + np.arange(seg,
                                                 dtype=np.float32))[None, :] \
            * np.float32(stepsize)                  # (R, seg)
        pos = rs[:, None, :] + rd[:, None, :] * t[:, :, None]
        v = (pos - bmin) / bsize * res - 0.5
        b = np.clip(np.floor(v).astype(np.int64) + 1, 0, res)
        bt = b.reshape(n_tiles, tile, seg, 3)
        ext = bt.max(axis=(1, 2)) - bt.min(axis=(1, 2)) + 1
        sz = np.maximum(sz, ext.max(axis=0))
    sz = np.minimum(sz + margin, res + 1)
    return int(sz[0]), int(sz[1]), int(sz[2])


class BoxfeatSpec(NamedTuple):
    """Static shape of the boxfeat latent path (see ``certify_boxfeat``).

    Corner counts per axis of the certified per-(ray-tile, segment)
    latent-grid footprint under LATTICE-aligned sampling, plus the
    gathered x-window width (in 8-corner blocks) and the lattice
    segment-count bound.
    """
    szxc: int   # corners along x (resolved on the lane axis)
    szyc: int   # corners along y
    szzc: int   # corners along z
    nxb: int    # x-window width in blocks of 8 corners (lane rows)
    n_seg: int  # segments needed: ceil(max tile k-span / seg)

    @property
    def szycp(self) -> int:
        """(z, y)-corner rows per x-block, padded to the sublane tile."""
        return ((self.szyc * self.szzc + 7) // 8) * 8


def certify_boxfeat(ray_start, ray_dir, grid_sizes, box_min, box_size, *,
                    stepsize: float, max_steps: int, seg: int, tile: int,
                    margin: int = 2, tmax_clip=None,
                    tmin_clip=None) -> BoxfeatSpec:
    """Certify the boxfeat latent path for a concrete ray set.

    Measures the per-(ray-tile, segment) latent-grid cell footprint under
    lattice-aligned sampling (t = k*stepsize, tile-uniform segment base
    K0 = min_ray ceil(tmin/h)) via the endpoint bound: positions are
    monotone in t per axis, so a ray's per-segment extent is attained at
    its clamped endpoints, and rays with no valid sample in a segment
    contribute nothing. Returns corner counts (+1 corner, +``margin``
    cells: one for the runtime base back-off, one for float divergence
    between this replay and the kernel's position math).

    The occupancy-calculator analog for this path (reference:
    volume_interpolation_network.cpp:987-1040 computeMaxWarps): a
    host-side pre-pass that sizes the kernel's on-chip working set.
    Requires concrete (non-traced) rays. O(rays * n_seg) -- endpoints
    only, no per-sample replay.
    """
    rs = np.asarray(ray_start, np.float32)
    rd = np.asarray(ray_dir, np.float32)
    bmin = np.asarray(box_min, np.float32)
    bsize = np.asarray(box_size, np.float32)
    res = np.asarray(grid_sizes, np.int64)          # (x, y, z)
    h = np.float32(stepsize)
    r_total = rs.shape[0]
    n_tiles = r_total // tile
    inv = 1.0 / np.where(rd == 0, 1e-12, rd)
    t0 = (bmin - rs) * inv
    t1 = (bmin + bsize - rs) * inv
    tmin = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0).astype(np.float32)
    tmax = np.maximum(t0, t1).min(axis=1).astype(np.float32)
    if tmax_clip is not None:
        tmax = np.minimum(tmax, np.asarray(tmax_clip, np.float32))
    if tmin_clip is not None:
        tmin = np.maximum(tmin, np.asarray(tmin_clip, np.float32))
    k0 = np.ceil(tmin / h)
    k0t = k0.reshape(n_tiles, tile).min(axis=1)
    k1 = np.floor(tmax / h)
    span = k1.reshape(n_tiles, tile).max(axis=1) - k0t + 1
    n_seg = max(1, int(np.ceil(max(float(span.max()), 1.0) / seg)))

    base_k = np.repeat(k0t, tile)
    ext_max = np.ones(3, np.int64)
    for s in range(n_seg):
        ta = np.maximum(k0, base_k + s * seg) * h
        tb = np.minimum(tmax, (base_k + (s * seg + seg - 1)) * h)
        alive = ta <= tb
        bs_ = []
        for t in (ta, tb):
            pos = rs + rd * t[:, None]
            v = (pos - bmin) / bsize * res - 0.5
            bs_.append(np.clip(np.floor(v).astype(np.int64) + 1, 0, res))
        blo = np.where(alive[:, None], np.minimum(*bs_), 10 ** 6)
        bhi = np.where(alive[:, None], np.maximum(*bs_), -10 ** 6)
        ext = (bhi.reshape(n_tiles, tile, 3).max(axis=1)
               - blo.reshape(n_tiles, tile, 3).min(axis=1) + 1)
        ext_max = np.maximum(ext_max, ext.max(axis=0))
    sz = np.minimum(ext_max + margin, res + 1)      # cells incl. margin
    szxc = int(sz[0]) + 1                           # corners
    szyc = int(sz[1]) + 1
    szzc = int(sz[2]) + 1
    nxb = (szxc + 7 + 7) // 8                       # worst base%8 == 7
    nxb = min(nxb, (int(res[0]) + 2 + 7) // 8)
    return BoxfeatSpec(szxc, szyc, szzc, nxb, n_seg)


class RayBucketPlan(NamedTuple):
    """Static plan for march-length tile bucketing (see
    :func:`plan_ray_buckets`)."""
    perm: np.ndarray          # (R,) tile-granular ray permutation
    inv: np.ndarray           # inverse permutation
    group_sizes: tuple        # rays per live group (multiples of tile)
    group_steps: tuple        # max_steps per group
    group_specs: tuple        # BoxfeatSpec per group (or 0s)
    dead: int                 # leading rays whose tiles never hit the box
    tmax_clip: Optional[np.ndarray] = None  # (R,) permuted per-ray t clamp
    group_specs_fine: tuple = ()  # per-bucket FINE (sub-segment window)
    #   BoxfeatSpec for the megakernel's grouped resolve (resolve_groups)
    tmin_clip: Optional[np.ndarray] = None  # (R,) permuted per-ray entry
    #   clip (probe_entry_tmin): leading empty space skipped per tile


def probe_saturation_tmax(ray_start, ray_dir, volume, tf, *,
                          stepsize: float, max_steps: int,
                          coarse: int = 8,
                          alpha_threshold: float = 0.999,
                          margin_steps: int = 16,
                          density_min: float = 0.0,
                          density_max: float = 1.0,
                          blend_beer: bool = True) -> np.ndarray:
    """Per-ray saturation-clamped tmax via a coarse (``coarse``x the
    stepsize) alpha-only march of the SAME volume+TF.

    The march-count planner analog of the reference's in-kernel
    early-out (renderer_ray_evaluation_stepping_dvr.cuh:93-99, alpha >=
    0.999 warp vote): on trained scenes rays saturate after a fraction
    of their geometric span, and a fixed-trip-count TPU march pays the
    full span anyway. This camera-static pre-pass estimates each ray's
    saturation depth at ``coarse * stepsize`` resolution and returns
    ``min(tmax, t_sat + margin_steps * stepsize)`` to feed
    :func:`plan_ray_buckets` (which then shrinks bucket segment counts)
    and the traces' ``tmax_clip``. Rays that never saturate keep their
    geometric tmax. The clamp changes the rendered function exactly the
    way the reference's own early-out does (truncation at alpha ~ 1);
    ``margin_steps`` absorbs the coarse-vs-fine discretization gap.

    Cost: max_steps/coarse plain-path samples per ray, once per camera
    (amortized like the bucket plan itself). Returns np (R,) f32.
    """
    h = float(stepsize)
    hc = h * coarse
    n_steps = max(1, -(-int(max_steps) // coarse))

    @jax.jit
    def run(rs, rd):
        dtype = rs.dtype
        tmin, tmax = intersect_aabb(rs, rd, volume.box_min.astype(dtype),
                                    volume.box_size.astype(dtype))
        tmin = jnp.maximum(tmin, 0.0)
        k0 = jnp.ceil(tmin / hc)
        lead = rs.shape[:-1]
        alpha0 = jnp.zeros(lead + (1,), dtype)
        tsat0 = jnp.full(lead + (1,), np.inf, dtype)
        prev0 = jnp.full(lead + (1,), -1.0, dtype)

        def step(carry, i):
            alpha, tsat, prev = carry
            t = (k0 + i.astype(dtype)) * hc
            validm = t <= tmax
            pos = rs + rd * t
            value, _ = volume.eval_density(pos, rd)
            value = value[..., None]
            d2 = (value - density_min) / (density_max - density_min)
            require = validm & (value >= density_min)
            rgba = tf.eval_normalized(
                jnp.clip(d2[..., 0], 0.0, 1.0), jnp.zeros_like(pos),
                prev[..., 0], hc)
            absn = jnp.where(require, rgba[..., 3:4], 0.0)
            if blend_beer:
                ca = 1.0 - jnp.exp(-absn)
            else:
                ca = jnp.minimum(1.0, absn)
            alpha = alpha + (1.0 - alpha) * ca
            tsat = jnp.where((alpha >= alpha_threshold)
                             & ~jnp.isfinite(tsat), t, tsat)
            return (alpha, tsat, d2), None

        (alpha, tsat, _), _ = jax.lax.scan(
            step, (alpha0, tsat0, prev0),
            jnp.arange(n_steps, dtype=jnp.int32))
        clip = jnp.where(jnp.isfinite(tsat), tsat + margin_steps * h,
                         tmax)
        return jnp.minimum(tmax, clip)[..., 0]

    return np.asarray(run(jnp.asarray(ray_start, jnp.float32),
                          jnp.asarray(ray_dir, jnp.float32)),
                      np.float32)


def probe_entry_tmin(ray_start, ray_dir, volume, tf, *,
                     stepsize: float, max_steps: int,
                     coarse: int = 8,
                     alpha_threshold: float = 1e-3,
                     margin_steps: int = 24,
                     density_min: float = 0.0,
                     density_max: float = 1.0,
                     blend_beer: bool = True) -> np.ndarray:
    """Per-ray ENTRY empty-space clip: the t where the coarse march's
    accumulated opacity first reaches ``alpha_threshold``, backed off
    by ``margin_steps`` fine steps (plus one coarse step for the
    crossing's in-step position). Feed as ``tmin_clip`` to
    :func:`plan_ray_buckets` / the fused traces: tile segment bases
    advance past leading empty space (min over each tile's rays), so
    spans -- and the march cost -- shrink from the FRONT exactly like
    :func:`probe_saturation_tmax` shrinks them from the tail. Rays that
    never reach the threshold return their tmax (they render ~nothing;
    their tile span collapses to the neighbors').

    Forward image error is ESTIMATED, not bounded: the probe marches at
    ``coarse * stepsize`` and can step over features thinner than the
    coarse stride, so the fine-march prefix opacity can exceed the
    coarse estimate; ``margin_steps`` is the heuristic mitigation (same
    caveat as :func:`probe_saturation_tmax`). Parameter gradients of
    the skipped samples are dropped, so this is a RENDERING clip (the
    reference's interactive renderer semantics), not a training
    default: classic plan-time empty-space skipping, the front-side
    counterpart of the reference's alpha>=0.999 early-out truncation.

    Cost: one coarse alpha march per ray, once per camera. Returns np
    (R,) f32.

    Measured on the trained flagship (512^2, round 4): NOT a default --
    rays whose thin features the coarse march steps over entirely are
    clipped to tmax (killed), leaving max image error 0.077 even at
    ``coarse=2``, while plan group_steps shrink by ZERO (the per-tile
    min over 256 rays collapses the entry advance). The plumbing is
    exact (fused == oracle at the same clip, test_fused.py); the
    estimate is the weak part. Use on scenes with genuinely empty
    margins, or feed a certified tmin from geometry instead.
    """
    t = probe_saturation_tmax(
        ray_start, ray_dir, volume, tf, stepsize=stepsize,
        max_steps=max_steps, coarse=coarse,
        alpha_threshold=alpha_threshold,
        margin_steps=-(margin_steps + coarse),
        density_min=density_min, density_max=density_max,
        blend_beer=blend_beer)
    return np.maximum(np.asarray(t, np.float32).reshape(-1), 0.0)


def plan_ray_buckets(ray_start, ray_dir, box_min, box_size, *,
                     stepsize: float, seg: int, tile: int,
                     n_buckets: int = 4, grid_sizes=None,
                     quantize: int = 0, tmax_clip=None,
                     tmin_clip=None,
                     resolve_groups: int = 1) -> RayBucketPlan:
    """Bucket ray tiles by march length so short tiles stop marching
    early.

    The fixed-count differentiable scan (and the forward without
    early-out) pays the WORST tile's segment count for every tile; on a
    512^2 flagship view the mean per-tile span is ~half the max, i.e.
    ~2x wasted march work. This host-side pre-pass (camera-static, like
    :func:`certify_boxfeat`) sorts tiles by their lattice span and
    groups them into ``n_buckets`` contiguous buckets; each bucket then
    runs its own fused trace with its own (smaller) segment count and
    its own certified footprint. Tiles that never intersect the box are
    sliced off entirely (their output is exactly zero). Tile contents
    are not reordered, so block-coherent tiles stay coherent.

    The reference has no analog (its while-march early-outs per warp);
    this is the TPU counterpart for fixed-trip-count programs. Requires
    concrete rays. Use with :func:`fused_trace_dvr_bucketed`.

    ``tmax_clip`` (np (R,), input ray order, from
    :func:`probe_saturation_tmax`) clamps each ray's march at its
    estimated saturation depth: spans, bucket segment counts, and the
    certified footprints all shrink to the TRAINED-scene march length,
    and the clip rides the plan into the traces (the megakernel masks
    per-ray samples past the clip exactly like past tmax).

    ``quantize`` > 0 makes the plan SHAPE camera-stable for jit reuse
    across cameras (e.g. ``time_rendering``): group sizes become fixed
    equal splits of the whole tile set (dead tiles fold into the
    shortest group) and step counts round up to multiples of
    ``quantize`` -- plans from different poses then usually hash to the
    same static structure, at the cost of the dead-tile slice-off.
    """
    rs = np.asarray(ray_start, np.float32)
    rd = np.asarray(ray_dir, np.float32)
    bmin = np.asarray(box_min, np.float32)
    bsize = np.asarray(box_size, np.float32)
    h = np.float32(stepsize)
    r_total = rs.shape[0]
    n_tiles = r_total // tile
    inv_d = 1.0 / np.where(rd == 0, 1e-12, rd)
    t0 = (bmin - rs) * inv_d
    t1 = (bmin + bsize - rs) * inv_d
    tmin = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
    tmax = np.maximum(t0, t1).min(axis=1)
    if tmax_clip is not None:
        tmax = np.minimum(tmax, np.asarray(tmax_clip, np.float32))
    if tmin_clip is not None:
        # entry empty-space clip (probe_entry_tmin): spans shrink from
        # the front; each tile's base advances by its rays' min clip
        tmin = np.maximum(tmin, np.asarray(tmin_clip, np.float32))
    k0 = np.ceil(tmin / h)
    k1 = np.floor(tmax / h)
    alive = (tmax > tmin) & (k1 >= k0)
    k0t = np.where(alive, k0, np.inf).reshape(n_tiles, tile).min(axis=1)
    k1t = np.where(alive, k1, -np.inf).reshape(n_tiles, tile).max(axis=1)
    span_t = np.where(np.isfinite(k0t), k1t - k0t + 1, 0.0)
    span_t = np.maximum(span_t, 0.0)

    order_t = np.argsort(span_t, kind="stable")
    perm = (order_t[:, None] * tile + np.arange(tile)).ravel()
    inv_p = np.argsort(perm)
    spans_sorted = span_t[order_t]
    n_dead = 0 if quantize else int(np.sum(spans_sorted <= 0))
    live = n_tiles - n_dead
    sizes, steps, specs, specs_fine = [], [], [], []
    clip_p = (np.asarray(tmax_clip, np.float32)[perm]
              if tmax_clip is not None else None)
    tminc_p = (np.asarray(tmin_clip, np.float32)[perm]
               if tmin_clip is not None else None)
    if resolve_groups > 1 and seg % resolve_groups:
        raise ValueError("resolve_groups must divide seg")
    if live > 0:
        edges = np.linspace(n_dead, n_tiles, n_buckets + 1).astype(int)
        rs_p = rs[perm]
        rd_p = rd[perm]
        for a, b in zip(edges[:-1], edges[1:]):
            if b <= a:
                continue
            g_steps = int(spans_sorted[a:b].max())
            g_steps = max(g_steps, 1)
            if quantize:
                g_steps = -(-g_steps // quantize) * quantize
            sizes.append((b - a) * tile)
            steps.append(g_steps)
            if grid_sizes is not None:
                clip_b = (clip_p[a * tile:b * tile]
                          if clip_p is not None else None)
                tminc_b = (tminc_p[a * tile:b * tile]
                           if tminc_p is not None else None)
                sp = certify_boxfeat(
                    rs_p[a * tile:b * tile], rd_p[a * tile:b * tile],
                    grid_sizes, bmin, bsize, stepsize=stepsize,
                    max_steps=g_steps, seg=seg, tile=tile,
                    tmax_clip=clip_b, tmin_clip=tminc_b)
                if quantize:
                    # stabilize the static spec across cameras: round
                    # footprint corners up to even, segment count to
                    # the quantized step budget
                    szxc = -(-sp.szxc // 2) * 2
                    nxb = min((szxc + 7 + 7) // 8,
                              (int(grid_sizes[0]) + 2 + 7) // 8)
                    sp = BoxfeatSpec(
                        szxc, -(-sp.szyc // 2) * 2,
                        -(-sp.szzc // 2) * 2, nxb,
                        max(sp.n_seg, -(-g_steps // seg)))
                specs.append(sp)
                if resolve_groups > 1:
                    # FINE certificate: the same endpoint math at
                    # sub-segment (seg/groups step) window granularity
                    # -- the megakernel's grouped resolve slices these
                    # smaller windows out of the resident slab
                    spf = certify_boxfeat(
                        rs_p[a * tile:b * tile], rd_p[a * tile:b * tile],
                        grid_sizes, bmin, bsize, stepsize=stepsize,
                        max_steps=g_steps, seg=seg // resolve_groups,
                        tile=tile, tmax_clip=clip_b, tmin_clip=tminc_b)
                    if quantize:
                        szxcf = -(-spf.szxc // 2) * 2
                        nxbf = min((szxcf + 7 + 7) // 8,
                                   (int(grid_sizes[0]) + 2 + 7) // 8)
                        spf = BoxfeatSpec(
                            szxcf, -(-spf.szyc // 2) * 2,
                            -(-spf.szzc // 2) * 2, nxbf, spf.n_seg)
                    specs_fine.append(spf)
            else:
                specs.append(0)
    return RayBucketPlan(perm=perm, inv=inv_p, group_sizes=tuple(sizes),
                         group_steps=tuple(steps), tmax_clip=clip_p,
                         group_specs=tuple(specs), dead=n_dead * tile,
                         group_specs_fine=tuple(specs_fine),
                         tmin_clip=tminc_p)


def fused_trace_iso(ray_start: Array, ray_dir: Array, net,
                    box_min, box_size, config, *,
                    max_steps: int,
                    seg: Optional[int] = 32, tile: Optional[int] = 256,
                    latent_mode: str = "table",
                    table_dtype=jnp.float32, subbox=0,
                    time=0.0, ensemble=0.0,
                    engine: str = "scan",
                    interpret: bool = False):
    """Fused isosurface rendering of an SRN: the fused Pallas march
    finds the first crossing (the iso epilogue in ``_segment_kernel``;
    hit rays trip the early-out voting), then bisection refinement and
    curvature/Lambert shading run per RAY in plain JAX
    (:func:`fvsrn_tpu.raytracer.iso.refine_and_shade` -- 8-ish network
    evaluations per ray, not per step, so the kernel only owns the
    march). The reference serves iso from the same fused kernel
    (renderer_ray_evaluation_stepping_iso.cuh over the tensor-core
    volume); this is its two-phase TPU equivalent.

    ``config``: a :class:`fvsrn_tpu.raytracer.iso.RayEvaluationSteppingIso`.
    With ``latent_mode="boxfeat"`` the march samples the step lattice --
    compare against ``trace_iso(..., lattice=True)``.
    Returns ``RayEvaluationOutput``.
    """
    from ..models.network_volume import VolumeInterpolationNetwork
    from ..raytracer.iso import refine_and_shade

    iso = config.isovalue
    stepsize = float(np.asarray(config.stepsize))
    dummy_tf = jnp.asarray(
        [[1.0, 1.0, 1.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0, 1.0]],
        jnp.float32)
    if engine == "mega":
        from .fused_mega import mega_trace_dvr
        raw = mega_trace_dvr(
            ray_start, ray_dir, net, box_min, box_size, dummy_tf,
            stepsize=stepsize, max_steps=max_steps, seg=seg, tile=tile,
            enable_early_out=True, alpha_early_out=0.999,
            table_dtype=table_dtype, subbox=subbox,
            time=time, ensemble=ensemble,
            iso_value=float(np.asarray(iso)), interpret=interpret)
    else:
        raw = fused_trace_dvr(
            ray_start, ray_dir, net, box_min, box_size, dummy_tf,
            stepsize=stepsize, max_steps=max_steps, seg=seg, tile=tile,
            enable_early_out=True, alpha_early_out=0.999,
            latent_mode=latent_mode, table_dtype=table_dtype,
            subbox=subbox, time=time, ensemble=ensemble,
            iso_value=float(np.asarray(iso)), interpret=interpret)
    depth = raw[:, 0:1]
    found = raw[:, 3:4] > 0.5
    vol = VolumeInterpolationNetwork.make(
        net, box_min=tuple(np.asarray(box_min)),
        box_size=tuple(np.asarray(box_size)), time=float(time),
        ensemble=float(ensemble))
    return refine_and_shade(ray_start, ray_dir, vol, config, depth,
                            found)


def fused_trace_dvr_bucketed(ray_start: Array, ray_dir: Array, net,
                             box_min, box_size, tf_tensor: Array, *,
                             plan: RayBucketPlan, engine: str = "scan",
                             segment_active_groups=None,
                             **kwargs):
    """Run :func:`fused_trace_dvr` per march-length bucket (see
    :func:`plan_ray_buckets`) and reassemble the output in the input ray
    order. ``kwargs`` are forwarded except ``max_steps``/``subbox``,
    which come from the plan. Jit-safe: the plan is static.

    ``engine="mega"`` runs each bucket through the single-call
    megakernel (:func:`fvsrn_tpu.ops.fused_mega.mega_trace_dvr`) instead
    of the per-segment scan -- requires a VMEM-resident latent slab and
    boxfeat (lattice) semantics.

    ``segment_active_groups`` (mega only): per-group (tiles, segments)
    TF-occupancy masks from
    :func:`fvsrn_tpu.ops.occupancy.plan_segment_occupancy` -- empty-
    space segments are culled before the MLP runs."""
    kwargs.pop("max_steps", None)
    kwargs.pop("subbox", None)
    if engine == "mega":
        from .fused_mega import mega_trace_dvr
        kwargs.pop("latent_mode", None)
        kwargs.pop("segment_remat", None)
        kwargs.pop("stash_backward", None)
        if plan.group_specs_fine and "resolve_groups" not in kwargs:
            raise ValueError("plan carries fine specs; pass the same "
                             "resolve_groups it was planned with")

        def trace(rs_, rd_, steps_, spec_, fine_, clip_, tminc_, sa_):
            return mega_trace_dvr(rs_, rd_, net, box_min, box_size,
                                  tf_tensor, max_steps=steps_,
                                  subbox=spec_, subbox_fine=fine_,
                                  tmax_clip=clip_, tmin_clip=tminc_,
                                  segment_active=sa_,
                                  **kwargs)
    else:
        kwargs.pop("resolve_groups", None)
        if segment_active_groups is not None:
            raise NotImplementedError(
                "segment_active requires engine='mega'")

        def trace(rs_, rd_, steps_, spec_, fine_, clip_, tminc_, sa_):
            return fused_trace_dvr(rs_, rd_, net, box_min, box_size,
                                   tf_tensor, max_steps=steps_,
                                   subbox=spec_, tmax_clip=clip_,
                                   tmin_clip=tminc_, **kwargs)
    perm = jnp.asarray(plan.perm)
    inv = jnp.asarray(plan.inv)
    rs = jnp.take(ray_start, perm, axis=0)
    rd = jnp.take(ray_dir, perm, axis=0)
    outs = []
    ofs = plan.dead
    fines = (plan.group_specs_fine if plan.group_specs_fine
             else (0,) * len(plan.group_sizes))
    sas = (segment_active_groups if segment_active_groups is not None
           else (None,) * len(plan.group_sizes))
    for size, g_steps, spec, fine, sa in zip(plan.group_sizes,
                                             plan.group_steps,
                                             plan.group_specs, fines,
                                             sas):
        clip_g = (jnp.asarray(plan.tmax_clip[ofs:ofs + size])
                  if plan.tmax_clip is not None else None)
        tminc_g = (jnp.asarray(plan.tmin_clip[ofs:ofs + size])
                   if plan.tmin_clip is not None else None)
        outs.append(trace(
            jax.lax.dynamic_slice_in_dim(rs, ofs, size),
            jax.lax.dynamic_slice_in_dim(rd, ofs, size),
            g_steps, spec, fine, clip_g, tminc_g, sa))
        ofs += size
    if plan.dead:
        dead_out = jax.tree.map(
            lambda a: jnp.zeros((plan.dead,) + a.shape[1:], a.dtype),
            outs[0])
        outs.insert(0, dead_out)
    out = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
    return jax.tree.map(lambda a: jnp.take(a, inv, axis=0), out)


def build_boxfeat_grid(grid: Array, nxb_tot: int) -> Array:
    """Padded raw-value latent grid in gather-row layout for boxfeat.

    grid: (C, D, H, W), C <= 16 (zero-padded to 16). Returns
    ((D+2)*(H+2)*nxb_tot, 128) where row ((z*(H+2))+y)*nxb_tot + xb
    holds corners x = xb*8 .. xb*8+7 (16 channels each, lane =
    xlocal*16 + c) of the edge-clamp-padded grid P[i] =
    G[clip(i-1, 0, n-1)] -- so cell b's corners live at padded coords
    b and b+1 and border-clamp trilerp falls out of the padding (same
    convention as :func:`build_neighborhood_table`). x beyond W+2 is
    zero and never carries trilerp weight. Built with jnp ops only, so
    gradients flow back to ``grid`` under AD.
    """
    grid = jnp.asarray(grid)
    c, d, hh, w = grid.shape
    assert c <= 16, "boxfeat grid supports <= 16 latent channels"
    if c < 16:
        grid = jnp.concatenate(
            [grid, jnp.zeros((16 - c, d, hh, w), grid.dtype)], axis=0)
    p = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="edge")
    xpad = nxb_tot * 8 - (w + 2)
    if xpad > 0:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (0, xpad)))
    t = p.transpose(1, 2, 3, 0)                 # (D+2, H+2, X, 16)
    return t.reshape((d + 2) * (hh + 2) * nxb_tot, 128)


def _boxfeat_row_offsets(spec: BoxfeatSpec):
    """Static per-part (oz, oy) corner offsets of the gather rows,
    parts (x-blocks) contiguous: row r of part p covers corner
    (base_z + oz[r], base_y + oy[r], x-block xb0 + p); pad rows
    (r >= szzc*szyc) repeat offset (0, 0) and carry zero trilerp
    weight by construction."""
    szycp = spec.szycp
    r = np.arange(szycp, dtype=np.int64)
    live = r < spec.szzc * spec.szyc
    oz = np.where(live, r // spec.szyc, 0)
    oy = np.where(live, r % spec.szyc, 0)
    return oz.astype(np.int32), oy.astype(np.int32)


class BoxfeatAux(NamedTuple):
    """In-kernel intermediates of the boxfeat resolve reused by the
    adjoint and the normal sweep."""
    lat_parts: tuple   # nxb x (SZYCP, 128) table slices (f32)
    m1: tuple          # nxb x (128, N) per-part contraction results
    wzy: Array         # (SZYCP, N) Khatri-Rao (z, y) corner weights
    wx: Array          # (KX, N) x corner weights, KX = nxb*8
    lx: Array          # (1, N) local x corner index (float)
    fx: Array          # (1, N) x fraction
    ly: Array          # (1, N) local y corner index
    fy: Array
    lz: Array          # (1, N) local z corner index
    fz: Array


def _apply_act(name: str, x: Array, p: float) -> Array:
    if "act" in _ABLATE:                     # timing-only fake
        return jnp.maximum(x, 0.0) + 0.1 * x
    if name not in ("ReLU", "None") and x.dtype == jnp.bfloat16:
        # Mosaic has no bf16 transcendentals; evaluate them in f32
        return _apply_act(name, x.astype(jnp.float32), p)
    if name == "ReLU":
        return jnp.maximum(x, 0.0)
    if name == "Sine":
        return _fast_sin(p * x)
    if name == "Sigmoid":
        return jax.nn.sigmoid(x)
    if name == "Softplus":
        return jax.nn.softplus(x)
    if name == "Snake":
        return x + _fast_sin(p * x) ** 2 / p
    if name == "SnakeAlt":
        return (x + 1.0 - _fast_cos(2.0 * p * x)) / (2.0 * p)
    if name == "None":
        return x
    raise ValueError(name)


def _act_value_deriv(name: str, x: Array, p: float):
    """(activation, d activation/dx) with SHARED trig range reduction --
    the activation stash path computes both in the forward for ~0.5
    extra polynomial evaluations instead of a full second transcendental
    in the backward (the reference's adjoint recomputes, tensorcores.cuh;
    we trade a small HBM stash for the recompute)."""
    if "act" in _ABLATE:                     # timing-only fake
        return jnp.maximum(x, 0.0) + 0.1 * x, jnp.clip(x, 0.1, 1.0)
    if name not in ("ReLU", "None") and x.dtype == jnp.bfloat16:
        return _act_value_deriv(name, x.astype(jnp.float32), p)
    if name == "ReLU":
        return jnp.maximum(x, 0.0), (x > 0).astype(x.dtype)
    if name == "Sine":
        s, c = _fast_sincos(p * x)
        return s, p * c
    if name == "Sigmoid":
        s = jax.nn.sigmoid(x)
        return s, s * (1.0 - s)
    if name == "Softplus":
        return jax.nn.softplus(x), jax.nn.sigmoid(x)
    if name == "Snake":
        s, c = _fast_sincos(p * x)
        return x + s * s / p, 1.0 + 2.0 * s * c
    if name == "SnakeAlt":
        s2, c2 = _fast_sincos(2.0 * p * x)
        return ((x + 1.0 - c2) / (2.0 * p),
                (1.0 + 2.0 * p * s2) / (2.0 * p))
    if name == "None":
        return x, jnp.ones_like(x)
    raise ValueError(name)


def _act_deriv(name: str, x: Array, p: float) -> Array:
    """d activation / d preactivation, f32 in/out (hand adjoints shared by
    the backward kernel and the in-kernel normal sweep; reference:
    renderer_activations.cuh adjoint paths)."""
    if name == "ReLU":
        return (x > 0).astype(x.dtype)
    if name == "Sine":
        return p * _fast_cos(p * x)
    if name == "Sigmoid":
        s = jax.nn.sigmoid(x)
        return s * (1.0 - s)
    if name == "Softplus":
        return jax.nn.sigmoid(x)
    if name == "Snake":
        return 1.0 + _fast_sin(2.0 * p * x)
    if name == "SnakeAlt":
        return (1.0 + 2.0 * p * _fast_sin(2.0 * p * x)) / (2.0 * p)
    if name == "None":
        return jnp.ones_like(x)
    raise ValueError(name)


def _apply_output_T(mode: str, y: Array):
    """Output parametrization on a transposed (C_out, N) head, matching
    ``models.srn._apply_output`` in screen/render semantics
    (reference: network.py:171-237). Returns (out, dvalue_dy) where
    dvalue_dy is only meaningful for density modes (the normal sweep)."""
    if mode == "density":
        v = jax.nn.sigmoid(y)
        return v, v * (1.0 - v)
    if mode == "density:direct":
        return jnp.clip(y, 0.0, 1.0), ((y > 0) & (y < 1)).astype(y.dtype)
    rgb = jax.nn.sigmoid(y[0:3])
    if mode == "rgbo":
        o = jax.nn.softplus(y[3:4].astype(jnp.float32))
    elif mode == "rgbo:exp":
        o = jnp.exp(y[3:4].astype(jnp.float32))
    elif mode == "rgbo:direct":
        rgb = jnp.clip(y[0:3], 0.0, 1.0)
        o = jnp.maximum(y[3:4], 0.0)
    else:
        raise ValueError(mode)
    return jnp.concatenate([rgb, o], axis=0), None


def _fourier_sincos_rot(f0, df, seg: int):
    """(sin, cos) of the whole (F, seg*tile) fourier phase block from
    ONE evaluated step block plus a per-ray step increment, via
    log-depth angle doubling: block j+m = block j rotated by m*df.

    Valid because lattice marching advances the phase LINEARLY along
    the step axis (x_k = x_0 + k*h*d -> f_k = f_0 + k*(h fourier@d)),
    so trig is evaluated 2F times per RAY instead of 2F per SAMPLE
    (~3x less VPU work than 32 :func:`_fast_sincos` blocks; rotation
    error compounds through <= log2(seg)+log2(seg) f32 fmas, ~1e-5).
    The reference has no analog -- its SFU evaluates per sample
    (renderer_volume_tensorcores.cuh fourier block); this trades on
    the TPU's lattice-aligned sampling.
    """
    # drift bound: the rotated pairs are never renormalized, so
    # sin^2+cos^2 drifts by ~eps per doubling/fma (measured ~1e-5 at
    # seg=32, covered by the gradient-oracle tests); error grows with
    # the doubling depth and |j*df|, so cap seg here -- renormalize
    # (sm, cm) per doubling step before lifting the cap.
    assert seg <= 128, "fourier phase rotation: renormalize before seg>128"
    s0, c0 = _fast_sincos(f0)
    sm, cm = _fast_sincos(df)
    bs_, bc_ = [s0], [c0]
    m = 1
    while m < seg:
        take = min(m, seg - m)
        for j in range(take):
            a_s, a_c = bs_[j], bc_[j]
            bs_.append(a_s * cm + a_c * sm)
            bc_.append(a_c * cm - a_s * sm)
        m *= 2
        if m < seg:
            sm, cm = 2.0 * sm * cm, cm * cm - sm * sm
    return jnp.concatenate(bs_, axis=1), jnp.concatenate(bc_, axis=1)


def _incat8(blocks, dtype):
    """Concatenate K-blocks with each block zero-padded to an 8-row
    multiple: every block boundary lands on a sublane-tile boundary, so
    the concat lowers to whole-vreg copies instead of sublane rotates
    (measured: the misaligned (47, N) layer-1 concat was a large VPU
    cost at N=8192)."""
    out = []
    for b in blocks:
        out.append(b.astype(dtype))
        padr = (-b.shape[0]) % 8
        if padr:
            out.append(jnp.zeros((padr, b.shape[1]), dtype))
    return jnp.concatenate(out, axis=0)


def _wcat8(w_blocks):
    """Weight-side counterpart of :func:`_incat8`: zero columns against
    the zero-padded input rows (tiny (32, K) concat, outside the hot
    per-sample path)."""
    out = []
    for w in w_blocks:
        out.append(w)
        padc = (-w.shape[1]) % 8
        if padc:
            out.append(jnp.zeros((w.shape[0], padc), w.dtype))
    return jnp.concatenate(out, axis=1)


def _mlp_forward_T(x, dirs, lat, fourier, fdir, w1pos, w1dir, w1cos, w1sin,
                   w1lat, b1, hw, hb, w_out, b_out,
                   *, activation, act_param, output_mode, compute_dtype,
                   want_pack: bool = False, want_stash: bool = False,
                   fourier_rot=None):
    """Transposed MLP: x (3, N), dirs (3, N)|None, lat (CL, N)|None ->
    (out (C_out, N), dvalue_dy|None, pack|None). ``pack`` holds the
    intermediates (pres, sinf, cosf) for the in-kernel position-gradient
    sweep (:func:`_mlp_position_grad_T`). ``want_stash`` instead returns
    (hs, dacts, sinf, cosf) -- post-activations + activation derivatives
    (computed with the SHARED range reduction, :func:`_act_value_deriv`)
    for the activation-stash backward. ``fourier_rot=(seg, dx_step)``
    (dx_step (3, tile) = per-ray normalized step delta) evaluates the
    fourier trig by phase rotation (:func:`_fourier_sincos_rot`) --
    only valid for lattice-aligned step-blocked sample layouts."""
    cd = compute_dtype

    def mm(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=jnp.float32)

    if "fourier" in _ABLATE:                 # timing-only fake
        f = jnp.broadcast_to(x[0:1], (fourier.shape[0], x.shape[1]))
        sinf, cosf = f * 0.5, 1.0 - f * 0.25
    elif fourier_rot is not None:
        seg_b, dxs = fourier_rot
        tile_n = x.shape[1] // seg_b
        f0 = mm(fourier, x[:, :tile_n])
        if dirs is not None and fdir is not None:
            f0 += mm(fdir, dirs[:, :tile_n])
        df = mm(fourier, dxs)
        sinf, cosf = _fourier_sincos_rot(
            f0.astype(jnp.float32), df.astype(jnp.float32), seg_b)
    else:
        f = mm(fourier, x)                   # (F, N)
        if dirs is not None and fdir is not None:
            f += mm(fdir, dirs)
        sinf, cosf = _fast_sincos(f.astype(jnp.float32))
    # single concatenated first-layer matmul: K-passes on the MXU are
    # quantized to 128, so 4-5 small-K block matmuls cost 4-5x one
    # K<=128 matmul (measured ~20 ms/frame at the flagship); the concat
    # copies are cheap VPU moves
    in_blocks = [x]
    w_blocks = [w1pos]
    if dirs is not None and w1dir is not None:
        in_blocks.append(dirs)
        w_blocks.append(w1dir)
    in_blocks += [cosf.astype(cd), sinf.astype(cd)]
    w_blocks += [w1cos, w1sin]
    if lat is not None:
        in_blocks.append(lat)
        w_blocks.append(w1lat)
    k_tot = sum(-(-b.shape[0] // 8) * 8 for b in in_blocks)
    if "l1mm" in _ABLATE:                    # timing-only fake
        # lane-broadcast of b1 (32,1): cheap, unlike a sublane broadcast
        h = jnp.broadcast_to(b1.astype(jnp.float32),
                             (b1.shape[0], x.shape[1])) * 1.0
        if "keepdeps" in _ABLATE:
            # keep every feeder live so the seam measures ONLY the
            # matmul+concat, not compiler DCE of the fourier/latent
            # chains that feed it
            h = h + 1e-30 * (x[0:1] + cosf[0:1] + sinf[0:1]
                             + (lat[0:1] if lat is not None else 0.0))
    elif k_tot <= 128:
        h = mm(_wcat8(w_blocks), _incat8(in_blocks, cd))
    else:
        h = mm(w_blocks[0], in_blocks[0])
        for wb, ib in zip(w_blocks[1:], in_blocks[1:]):
            h += mm(wb, ib)
    h += b1.astype(jnp.float32)
    pres = [h]
    hs = []
    dacts = []

    # activations in the compute dtype: bf16 packs 2 lanes/transcendental
    # (the reference evaluates them in fp16 on the SFU too,
    # renderer_activations.cuh half2 paths)
    def act(pre):
        if want_stash:
            v, d = _act_value_deriv(activation, pre.astype(cd), act_param)
            hs.append(v)
            dacts.append(d)
            return v
        return _apply_act(activation, pre.astype(cd), act_param)

    h = act(h)
    for k in range(len(hw)):
        if "hidmm" in _ABLATE:               # timing-only fake
            pre = h * 1.01 + hb[k].astype(jnp.float32)
        else:
            pre = mm(hw[k], h) + hb[k].astype(jnp.float32)
        pres.append(pre)
        h = act(pre)
    if w_out.shape[0] == 1:
        # M=1 output head: an MXU matmul still pays the full pass per
        # lane-tile for one live sublane; a broadcast-multiply +
        # sublane reduction on the VPU is ~free next to it
        y = jnp.sum(w_out.T.astype(jnp.float32) * h.astype(jnp.float32),
                    axis=0, keepdims=True) + b_out.astype(jnp.float32)
    else:
        y = mm(w_out, h) + b_out.astype(jnp.float32)  # (C_out, N)
    out, dv_dy = _apply_output_T(output_mode, y)
    pack = None
    if want_pack:
        pack = (pres, sinf, cosf)
    elif want_stash:
        pack = (hs, dacts, sinf, cosf)
    return out, dv_dy, pack


def _mlp_position_grad_T(pack, dv_dy, x, rows_t, fourier, w1pos, w1cos,
                         w1sin, w1lat, hw, w_out,
                         *, activation, act_param, grid_sizes,
                         has_latent_table, compute_dtype,
                         latent_boxfeat=()):
    """In-kernel d(value)/d(pos01): the MXU analogue of the reference's
    transposed-weight wmma adjoint normal
    (renderer_volume_tensorcores.cuh:1202-1450) with ANALYTIC latent-grid
    position gradients instead of central differences (:608-729) -- the
    trilerp corner weights are piecewise-linear in the position fractions,
    so their derivative is exact and costs three reweighted row sums.

    Returns (3, N) gradient wrt the [0,1]^3 position. The caller divides
    by box_size for the world-space gradient.
    """
    cd = compute_dtype
    pres, sinf, cosf = pack

    def mm(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=jnp.float32)

    dh = mm(w_out.T, dv_dy)                     # (H, N)
    for k in reversed(range(len(hw))):
        dpre = dh * _act_deriv(activation, pres[k + 1], act_param)
        dh = mm(hw[k].T, dpre)
    dpre1 = dh * _act_deriv(activation, pres[0], act_param)

    dx = mm(w1pos.T, dpre1)                     # (3, N)
    d_cos = mm(w1cos.T, dpre1)
    d_sin = mm(w1sin.T, dpre1)
    d_f = cosf * d_sin - sinf * d_cos
    dx += mm(fourier.T, d_f)
    if has_latent_table:
        # lat = rows_t * wrep(fx,fy,fz); d wrep/d frac is wrep with the
        # per-axis factor replaced by its +-1 sign; d frac/d pos01 = res
        dlat = mm(w1lat.T, dpre1)               # (128, N)
        g = dlat * rows_t
        wrep, wgx, wgy, wgz = _corner_weight_pack(x, grid_sizes,
                                                  with_grads=True)
        del wrep
        ones = jnp.ones((1, 128), jnp.float32)
        dx += jnp.concatenate([
            mm(ones, g * wgx) * float(grid_sizes[0]),
            mm(ones, g * wgy) * float(grid_sizes[1]),
            mm(ones, g * wgz) * float(grid_sizes[2]),
        ], axis=0)
    if latent_boxfeat:
        aux: BoxfeatAux = rows_t
        dlatf = mm(w1lat.T, dpre1)                  # (16, N)
        dx += _boxfeat_dx(aux, dlatf, latent_boxfeat, grid_sizes,
                          compute_dtype)
    return dx


def _boxfeat_dx(aux: "BoxfeatAux", dlatf, spec_t, grid_sizes,
                compute_dtype):
    """Boxfeat latent POSITION gradient: (3, N) = d<dlatf, feat>/d pos01.

    The trilerp weight factorizes per axis, so d feat / d frac_axis
    reuses the per-part contractions with one axis' lerp factor replaced
    by its +-1 sign (x: reuse aux.m1; y/z: one extra matmul per part).
    Shared by the forward-mode normal sweep (:func:`_mlp_position_grad_T`
    with dlatf = w1lat^T dpre) and the reverse-mode ray-gradient path
    (dlatf = the latent-feature cotangent d_lat)."""
    szxc, szyc, szzc, nxb, szycp = spec_t
    n = dlatf.shape[1]
    f32 = jnp.float32
    cd = compute_dtype

    def mm(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=f32)

    def xfold(mlist, wvec):
        acc = jnp.zeros((16, n), f32)
        for p_ in range(nxb):
            for rr in range(8):
                acc = acc + mlist[p_][rr * 16:(rr + 1) * 16, :] \
                    * wvec[p_ * 8 + rr:p_ * 8 + rr + 1, :]
        return acc

    iox = jax.lax.broadcasted_iota(jnp.int32, (nxb * 8, n),
                                   0).astype(f32)
    wxg = jnp.where(iox == aux.lx, -1.0, 0.0) \
        + jnp.where(iox == aux.lx + 1.0, 1.0, 0.0)
    dffx = xfold(aux.m1, wxg)

    ioy = jax.lax.broadcasted_iota(jnp.int32, (szyc, n),
                                   0).astype(f32)
    ioz = jax.lax.broadcasted_iota(jnp.int32, (szzc, n),
                                   0).astype(f32)
    wyv = jnp.where(ioy == aux.ly, 1.0 - aux.fy, 0.0) \
        + jnp.where(ioy == aux.ly + 1.0, aux.fy, 0.0)
    wzv = jnp.where(ioz == aux.lz, 1.0 - aux.fz, 0.0) \
        + jnp.where(ioz == aux.lz + 1.0, aux.fz, 0.0)
    dwy = jnp.where(ioy == aux.ly, -1.0, 0.0) \
        + jnp.where(ioy == aux.ly + 1.0, 1.0, 0.0)
    dwz = jnp.where(ioz == aux.lz, -1.0, 0.0) \
        + jnp.where(ioz == aux.lz + 1.0, 1.0, 0.0)
    zy_pad = szycp - szzc * szyc
    zpad = ([jnp.zeros((zy_pad, n), f32)] if zy_pad else [])
    wzy_dy = jnp.concatenate(
        [wzv[oz:oz + 1, :] * dwy for oz in range(szzc)] + zpad,
        axis=0)
    wzy_dz = jnp.concatenate(
        [dwz[oz:oz + 1, :] * wyv for oz in range(szzc)] + zpad,
        axis=0)
    m2 = [jax.lax.dot_general(aux.lat_parts[p_], wzy_dy,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
          for p_ in range(nxb)]
    m3 = [jax.lax.dot_general(aux.lat_parts[p_], wzy_dz,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
          for p_ in range(nxb)]
    dffy = xfold(m2, aux.wx)
    dffz = xfold(m3, aux.wx)
    ones16 = jnp.ones((1, 16), f32)
    return jnp.concatenate([
        mm(ones16, dlatf * dffx) * float(grid_sizes[0]),
        mm(ones16, dlatf * dffy) * float(grid_sizes[1]),
        mm(ones16, dlatf * dffz) * float(grid_sizes[2]),
    ], axis=0)


def _corner_weight_pack(x, grid_sizes, with_grads: bool = False):
    """(3, N) positions -> trilerp corner weights in the (128, N)
    replicated neighborhood-table row layout (8 corner weights broadcast
    over 16-channel blocks). With ``with_grads``, also the three exact
    derivative stencils d w / d frac_axis (the per-axis lerp factor
    replaced by its +-1 sign)."""
    n = x.shape[1]
    vx = x[0:1] * float(grid_sizes[0]) - 0.5
    vy = x[1:2] * float(grid_sizes[1]) - 0.5
    vz = x[2:3] * float(grid_sizes[2]) - 0.5
    fx = vx - jnp.floor(vx)                 # (1, N)
    fy = vy - jnp.floor(vy)
    fz = vz - jnp.floor(vz)
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    one = jnp.ones_like(fx)

    def rep(w8):
        return jnp.concatenate(
            [jnp.broadcast_to(wk, (16, n)) for wk in w8], axis=0)

    def stencil(zf, yf, xf):
        # corner order k = dz*4 + dy*2 + dx
        return [zf[0] * yf[0] * xf[0], zf[0] * yf[0] * xf[1],
                zf[0] * yf[1] * xf[0], zf[0] * yf[1] * xf[1],
                zf[1] * yf[0] * xf[0], zf[1] * yf[0] * xf[1],
                zf[1] * yf[1] * xf[0], zf[1] * yf[1] * xf[1]]

    wrep = rep(stencil((gz, fz), (gy, fy), (gx, fx)))
    if not with_grads:
        return wrep
    wgx = rep(stencil((gz, fz), (gy, fy), (-one, one)))
    wgy = rep(stencil((gz, fz), (-one, one), (gx, fx)))
    wgz = rep(stencil((-one, one), (gy, fy), (gx, fx)))
    return wrep, wgx, wgy, wgz


def _corner_wrep(x, grid_sizes):
    return _corner_weight_pack(x, grid_sizes)


def _subbox_onehot(lrow_ref, sz3p: int, n: int, dtype):
    """(1, 1, N) f32 local-row indices -> (SZ3P, N) one-hot matrix."""
    lrow = lrow_ref[0].astype(jnp.int32)      # (1, N)
    iot = jax.lax.broadcasted_iota(jnp.int32, (sz3p, n), 0)
    return (iot == lrow).astype(dtype)


def _boxfeat_features(x, lat_ref, base_ref, *, spec_t, grid_sizes,
                      compute_dtype=jnp.float32):
    """Factorized raw-grid trilerp: the boxfeat in-kernel resolve.

    The TPU answer to the reference's 3D-texture latent fetch
    (renderer_volume_tensorcores.cuh:839-948), v2: instead of resolving
    per-sample 128-lane corner rows with a one-hot MXU contraction
    (sz3p x 128 x N MACs + a sz3p x N one-hot build), exploit that the
    trilerp weight factorizes per axis: build tiny per-axis corner
    weight vectors, Khatri-Rao the (z, y) pair into a (SZYCP, N)
    matrix (4 select-fma passes), contract it against each gathered
    x-block of raw values (nxb matmuls of 128 x SZYCP x N), and fold
    the x weights in with a cheap 8-slice weighted block-sum. Emits
    interpolated (16, N) features directly -- no corner-row
    materialization, no 8x-tiled first-layer block.

    x: (3, N) positions in [0,1]^3. lat_ref: (nxb*SZYCP, 128) gathered
    sub-box rows. base_ref: SMEM (1, 1, 4) f32 [base_y, base_z, xb0, K0].
    Returns (feat (16, N) f32, BoxfeatAux).
    """
    szxc, szyc, szzc, nxb, szycp = spec_t
    base_y = base_ref[0, 0, 0]
    base_z = base_ref[0, 0, 1]
    xb0 = base_ref[0, 0, 2]
    parts = [lat_ref[p_ * szycp:(p_ + 1) * szycp, :].astype(jnp.float32)
             for p_ in range(nxb)]
    return _boxfeat_features_parts(x, parts, base_y, base_z, xb0,
                                   spec_t=spec_t, grid_sizes=grid_sizes,
                                   compute_dtype=compute_dtype)


def _boxfeat_features_parts(x, parts, base_y, base_z, xb0, *,
                            spec_t, grid_sizes,
                            compute_dtype=jnp.float32):
    """Core of the factorized trilerp resolve over pre-sliced x-block
    parts (nxb arrays of (SZYCP, 128) f32 rows, row = oz*szyc + oy) and
    traced base scalars. Shared by the per-segment kernel (gathered-row
    layout) and the megakernel (VMEM-resident slab layout, where szyc
    is the 8-aligned y window and szycp = szzc*szyc).

    ``compute_dtype=bfloat16`` runs the (128 x SZYCP x N) resolve
    matmuls natively on the MXU (f32 accumulation); the trilerp weights
    then carry ~2^-9 relative error -- inside the reference's own fp16
    fidelity contract (|delta| < 1e-2, unittests/testSRN.cpp:408)."""
    szxc, szyc, szzc, nxb, szycp = spec_t
    gx, gy, gz = grid_sizes
    n = x.shape[1]
    f32 = jnp.float32

    def axis(vcomp, res):
        v = vcomp * float(res) - 0.5
        fl = jnp.floor(v)
        b = jnp.clip(fl + 1.0, 0.0, float(res))
        return b, v - fl                       # (1, N) each

    bx, fx = axis(x[0:1], gx)
    by, fy = axis(x[1:2], gy)
    bz, fz = axis(x[2:3], gz)
    # local corner indices; invalid (masked) samples clamp into the box
    kx = nxb * 8
    lx = jnp.clip(bx - 8.0 * xb0, 0.0, float(kx - 2))
    ly = jnp.clip(by - base_y, 0.0, float(szyc - 2))
    lz = jnp.clip(bz - base_z, 0.0, float(szzc - 2))

    # i32 iota (Mosaic has no float iota), cast for the f32 compares
    iox = jax.lax.broadcasted_iota(jnp.int32, (kx, n), 0).astype(f32)
    wx = jnp.where(iox == lx, 1.0 - fx, 0.0) \
        + jnp.where(iox == lx + 1.0, fx, 0.0)          # (KX, N)
    # (z, y) corner weights built per axis and Khatri-Rao'd on the VPU:
    # the joint (SZYCP, N) one-hot build (4 compare+select+fma passes
    # over the full row window) was ~4x the vreg work of two small
    # per-axis one-hots plus szzc sublane-broadcast multiplies.
    # (MXU-expanded one-hots measured WORSE than either -- the VPU work
    # hides under the matmuls only until the VPU is the critical path.)
    if "wzy" in _ABLATE:                               # timing-only fake
        wzy = jnp.broadcast_to(fy * fz, (szycp, n))
    else:
        ioy = jax.lax.broadcasted_iota(jnp.int32, (szyc, n), 0) \
            .astype(f32)
        wyv = jnp.where(ioy == ly, 1.0 - fy, 0.0) \
            + jnp.where(ioy == ly + 1.0, fy, 0.0)      # (szyc, N)
        ioz = jax.lax.broadcasted_iota(jnp.int32, (szzc, n), 0) \
            .astype(f32)
        wzv = jnp.where(ioz == lz, 1.0 - fz, 0.0) \
            + jnp.where(ioz == lz + 1.0, fz, 0.0)      # (szzc, N)
        zy_pad = szycp - szzc * szyc  # sublane-alignment pad rows
        wzy = jnp.concatenate(
            [wzv[oz:oz + 1, :] * wyv for oz in range(szzc)]
            + ([jnp.zeros((zy_pad, n), f32)] if zy_pad else []), axis=0)

    lat_parts = []
    m1 = []
    wzy_c = wzy.astype(compute_dtype)
    for p_ in range(nxb):
        part = parts[p_]
        lat_parts.append(part)
        if "resolve" in _ABLATE:                       # timing-only fake
            m1.append(jnp.broadcast_to(wzy[0:1, :], (128, n)))
        else:
            m1.append(jax.lax.dot_general(
                part.astype(compute_dtype), wzy_c,
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32))           # (128, N)
    feat = jnp.zeros((16, n), f32)
    if "xfold" in _ABLATE:                             # timing-only fake
        feat = m1[0][0:16, :] * wx[0:1, :]
    else:
        for p_ in range(nxb):
            for rr in range(8):
                feat = feat + m1[p_][rr * 16:(rr + 1) * 16, :] \
                    * wx[p_ * 8 + rr:p_ * 8 + rr + 1, :]
    aux = BoxfeatAux(tuple(lat_parts), tuple(m1), wzy, wx,
                     lx, fx, ly, fy, lz, fz)
    return feat, aux


def _latent_features(x, lat_ref, lrow_ref, *, has_latent, latent_table,
                     latent_subbox, grid_sizes, compute_dtype,
                     latent_boxfeat=(), base_ref=None):
    """Per-sample latent features in transposed layout.

    Returns (lat, wrep, onehot, rows_t): lat is (128, N) corner-weighted
    neighborhood rows (table modes), (16, N) interpolated features
    (boxfeat mode; rows_t then carries the BoxfeatAux), or (CL, N)
    trilerped features; wrep/onehot/rows_t (the unweighted per-sample
    rows) are the reusable intermediates for the adjoint and the normal
    sweep.

    Sub-box mode is the TPU answer to the reference's 3D-texture latent
    fetch (renderer_volume_tensorcores.cuh:839-948): the caller gathers
    ONE small sub-box of table rows per (ray-tile, segment) -- legal
    because a coherent pixel-block tile marching one segment only spans
    a few grid cells -- and the kernel resolves per-sample rows from the
    VMEM-resident sub-box with a one-hot MXU contraction, which also
    emits the rows directly in (128, N) layout (no in-kernel transpose).
    """
    if not has_latent:
        return None, None, None, None
    if latent_boxfeat:
        feat, aux = _boxfeat_features(x, lat_ref, base_ref,
                                      spec_t=latent_boxfeat,
                                      grid_sizes=grid_sizes,
                                      compute_dtype=compute_dtype)
        return feat, None, None, aux
    if latent_subbox:
        sz3p = latent_subbox[3]
        n = x.shape[1]
        wrep = _corner_wrep(x, grid_sizes)
        oh_dtype = (jnp.bfloat16 if lat_ref.dtype == jnp.bfloat16
                    else jnp.float32)
        oh = _subbox_onehot(lrow_ref, sz3p, n, oh_dtype)
        rows_t = jax.lax.dot_general(
            lat_ref[:], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (128, N)
        return rows_t * wrep, wrep, oh, rows_t
    if latent_table:
        # per-sample gathered rows (N, 128): fold the 8 corner weights
        # into a (128, N) mask; the channel sum is absorbed into the
        # (H, 128) first-layer latent block (see fused_trace_dvr)
        wrep = _corner_wrep(x, grid_sizes)
        rows_t = lat_ref[:].astype(jnp.float32).T
        return rows_t * wrep, wrep, None, rows_t
    return lat_ref[0], None, None, None


def _piecewise_tf(v2, tf_ref, *, tf_points: int, density_min: float,
                  density_max: float, stepsize: float):
    """Piecewise-linear TF on a dense (seg, tile) value block, unrolled
    over control intervals (reference: renderer_tf_piecewise.cuh:27-64);
    interval index i = sum_k [knot_k <= d] over interior knots. Returns
    (rgba list of 4 (seg, tile), absorption, density2)."""
    inv_range = 1.0 / (density_max - density_min)
    density2 = (v2 - density_min) * inv_range
    d_clip = jnp.clip(density2, 0.0, 1.0)
    knots = [tf_ref[k, 4] for k in range(tf_points)]
    interval = jnp.zeros_like(d_clip, dtype=jnp.int32)
    for k in range(1, tf_points - 1):
        interval += (knots[k] <= d_clip).astype(jnp.int32)
    rgba = [jnp.zeros_like(d_clip) for _ in range(4)]
    for k in range(tf_points - 1):
        p0 = knots[k]
        p1 = knots[k + 1]
        frac = (jnp.clip(d_clip, p0, p1) - p0) / (p1 - p0)
        sel = interval == k
        for c in range(4):
            v = tf_ref[k, c] + frac * (tf_ref[k + 1, c] - tf_ref[k, c])
            rgba[c] = jnp.where(sel, v, rgba[c])
    absorption = rgba[3] * stepsize            # (seg, tile)
    return rgba, absorption, density2


def _compose_tree(rgba, absorption, require, seg: int, *, blend_beer: bool,
                  normals=None, tval2=None):
    """Compositing as an associative tree reduction over the step axis:
    per-step element (C_j, A_j) with C_j = rgba_j * ca_j; composition
    (C1,A1)o(C2,A2) = (C1+(1-A1)C2, A1+(1-A1)A2) reproduces sequential
    front-to-back blending exactly (alpha "over" is associative).
    Normals and depth blend with the same weights as color
    (reference: renderer_blending.cuh:36-52).
    In-segment alpha-early-out is dropped (segment-level voting only);
    the skipped tail is weighted by (1-alpha) <= 1-early_alpha.
    Returns (seg_c list, seg_a), each (1, tile)."""
    absn = jnp.where(require, absorption, 0.0)
    if blend_beer:
        ca = 1.0 - jnp.exp(-absn)
    else:
        ca = jnp.minimum(1.0, absn)
    prem = [jnp.where(require, rgba[c], 0.0) * ca for c in range(3)]
    if normals is not None:
        prem += [jnp.where(require, nc, 0.0) for nc in normals]
        prem.append(jnp.where(require, tval2, 0.0))
        prem[3:7] = [p * ca for p in prem[3:7]]

    def compose(lhs, rhs):
        lc, la = lhs
        rc, ra = rhs
        w = 1.0 - la
        return [a + w * b for a, b in zip(lc, rc)], la + w * ra

    def reduce_range(lo, size):
        if size == 1:
            return ([p[lo:lo + 1] for p in prem], ca[lo:lo + 1])
        half = size // 2
        return compose(reduce_range(lo, half),
                       reduce_range(lo + half, size - half))

    return reduce_range(0, seg)


def _stash_rows(num_fourier: int, hidden: int, n_hidden: int) -> int:
    """Row count of the activation stash written by the forward kernel
    for the stash backward: [sinf | cosf] (each padded to 8 rows) +
    post-activations + activation derivatives per layer."""
    f8 = -(-num_fourier // 8) * 8
    return 2 * f8 + 2 * (n_hidden + 1) * hidden


def _segment_kernel(s_ref, rays_ref, lat_ref, *refs,
                    n_hidden: int, activation: str, act_param: float,
                    output_mode: str, has_latent: bool,
                    latent_table: bool, grid_sizes: tuple, tf_points: int,
                    blend_beer: bool, seg: int, tile: int,
                    density_min: float, density_max: float,
                    stepsize: float, early_alpha: float,
                    box_min: tuple, box_size: tuple,
                    compute_dtype, latent_subbox: tuple = (),
                    latent_boxfeat: tuple = (),
                    has_direction: bool = False,
                    need_normals: bool = False,
                    brdf: tuple = (),
                    want_stash: bool = False,
                    iso_value=None,
                    tf_mode: str = "piecewise",
                    tf_pre_rows: int = 0):
    """One (ray-tile, segment) program in transposed layout.

    s (1, 1) scalar segment index (SMEM); rays (8, tile) packet
    [start*3, dir*3, tmin, tmax]; lat = table rows (N, 128), sub-box
    rows (SZ3P, 128) (followed by a (1, 1, N) local-row ref), or
    features (1, CL, N); carry (8|16, tile) (16 rows carry blended
    normal+depth when ``need_normals``); N = seg*tile, column =
    j*tile + ray. Positions are rebuilt in-kernel from the ray packet --
    streaming them from HBM plus the XLA-side transposes cost
    26 ms/segment (measured), ~10x the useful work.

    ``need_normals`` adds the in-kernel adjoint normal sweep + Blinn-
    Phong/Lambert shading (the MXU analogue of the reference's fused
    evalNormal, renderer_volume_tensorcores.cuh:1202-1450 and
    renderer_brdf_lambert.cuh:55-105). rgbo output modes skip the TF
    (reference: RAY_EVALUATION_STEPPING__SKIP_TRANSFER_FUNCTION).
    """
    lrow_ref = None
    base_ref = None
    if latent_subbox:
        lrow_ref = refs[0]
        refs = refs[1:]
    elif latent_boxfeat:
        # SMEM (1, 1, 4) f32 per-(tile, segment) scalars:
        # [base_y, base_z, xb0, K0] (see _segment_boxfeat)
        base_ref = refs[0]
        refs = refs[1:]
    carry_ref = refs[0]
    (fourier_ref, fdir_ref, w1pos_ref, w1dir_ref, w1cos_ref, w1sin_ref,
     w1lat_ref, b1_ref) = refs[1:9]
    rest_refs = refs[9:]
    hw = rest_refs[:n_hidden]
    hb = rest_refs[n_hidden:2 * n_hidden]
    wout_ref = rest_refs[2 * n_hidden]
    bout_ref = rest_refs[2 * n_hidden + 1]
    tf_ref = rest_refs[2 * n_hidden + 2]
    out_ref = rest_refs[2 * n_hidden + 3]
    stash_ref = rest_refs[2 * n_hidden + 4] if want_stash else None
    rgbo = not output_mode.startswith("density")

    s = s_ref[0, 0].astype(jnp.float32)
    rays = rays_ref[:]                         # (8, tile)
    tmin = rays[6:7, :]                        # (1, tile); k0_ray in
    tmax = rays[7:8, :]                        # boxfeat (lattice) mode
    # t per step, tiled over the segment: (1, N), N-major = j*tile + ray
    if latent_boxfeat:
        # lattice-aligned sampling: t = k*h on the GLOBAL step lattice,
        # k counted from the tile-uniform base K0 -- the spatial
        # coherence that certifies the per-(tile, segment) sub-box
        k0 = base_ref[0, 0, 3]
        kk = jnp.concatenate(
            [tmin * 0.0 + (k0 + s * seg + jnp.float32(jj))
             for jj in range(seg)], axis=1)    # (1, N) integer-valued
        tval = kk * stepsize
    else:
        tval = jnp.concatenate(
            [tmin + (jnp.float32((jj)) + s * seg) * stepsize
             for jj in range(seg)], axis=1)    # (1, N)
    # world positions -> [0,1]^3 volume coords, channel-by-channel
    xs = []
    ds = []
    for c in range(3):
        sc = jnp.concatenate([rays[c:c + 1, :]] * seg, axis=1)
        dc = jnp.concatenate([rays[3 + c:4 + c, :]] * seg, axis=1)
        ds.append(dc)
        xs.append((sc + tval * dc - box_min[c]) / box_size[c])
    x = jnp.concatenate(xs, axis=0)            # (3, N)
    dirs = jnp.concatenate(ds, axis=0) if has_direction else None
    lat, _, _, rows_t = _latent_features(
        x, lat_ref, lrow_ref, has_latent=has_latent,
        latent_table=latent_table, latent_subbox=latent_subbox,
        grid_sizes=grid_sizes, compute_dtype=compute_dtype,
        latent_boxfeat=latent_boxfeat, base_ref=base_ref)
    value, dv_dy, pack = _mlp_forward_T(
        x, dirs, lat, fourier_ref[:],
        fdir_ref[:] if has_direction else None, w1pos_ref[:],
        w1dir_ref[:] if has_direction else None,
        w1cos_ref[:], w1sin_ref[:],
        w1lat_ref[:] if has_latent else None, b1_ref[:],
        [w[:] for w in hw], [b[:] for b in hb], wout_ref[:], bout_ref[:],
        activation=activation, act_param=act_param,
        output_mode=output_mode, compute_dtype=compute_dtype,
        want_pack=need_normals, want_stash=want_stash)
    # value: (C_out, N)

    if want_stash:
        # activation stash for the zero-trig backward (see
        # :func:`_stash_rows` for the layout)
        hs_s, dacts_s, sinf_s, cosf_s = pack
        f32 = jnp.float32
        fcount = sinf_s.shape[0]
        f8 = -(-fcount // 8) * 8
        hcount = hs_s[0].shape[0]
        assert hcount % 8 == 0, "stash path needs hidden % 8 == 0"

        def pad8(a):
            if a.shape[0] == f8:
                return a.astype(f32)
            return jnp.concatenate(
                [a.astype(f32),
                 jnp.zeros((f8 - a.shape[0], a.shape[1]), f32)], axis=0)

        stash_ref[0:f8, :] = pad8(sinf_s)
        stash_ref[f8:2 * f8, :] = pad8(cosf_s)
        off = 2 * f8
        for hval in hs_s:
            stash_ref[off:off + hcount, :] = hval.astype(f32)
            off += hcount
        for dval in dacts_s:
            stash_ref[off:off + hcount, :] = dval.astype(f32)
            off += hcount

    out_ref[:] = _march_epilogue(
        value=value, dv_dy=dv_dy, pack=pack, rows_t=rows_t, x=x,
        rays=rays, tval=tval, kk=kk if latent_boxfeat else None,
        carry=carry_ref[:],
        fourier=fourier_ref[:], w1pos=w1pos_ref[:], w1cos=w1cos_ref[:],
        w1sin=w1sin_ref[:],
        w1lat=w1lat_ref[:] if has_latent else None,
        hw=[w[:] for w in hw], w_out=wout_ref[:], tf=tf_ref,
        activation=activation, act_param=act_param,
        output_mode=output_mode, has_latent=has_latent,
        has_latent_table=has_latent and (latent_table
                                         or bool(latent_subbox)),
        latent_boxfeat=(latent_boxfeat if has_latent else ()),
        grid_sizes=grid_sizes, tf_points=tf_points,
        tf_pre_rows=tf_pre_rows, tf_mode=tf_mode, blend_beer=blend_beer,
        seg=seg, tile=tile, density_min=density_min,
        density_max=density_max, stepsize=stepsize, box_min=box_min,
        box_size=box_size, compute_dtype=compute_dtype,
        need_normals=need_normals, brdf=brdf, iso_value=iso_value,
        lattice=bool(latent_boxfeat))


def _march_epilogue(*, value, dv_dy, pack, rows_t, x, rays, tval, kk,
                    carry, fourier, w1pos, w1cos, w1sin, w1lat, hw,
                    w_out, tf,
                    activation, act_param, output_mode, has_latent,
                    has_latent_table, latent_boxfeat, grid_sizes,
                    tf_points, tf_pre_rows, tf_mode, blend_beer,
                    seg, tile, density_min, density_max, stepsize,
                    box_min, box_size, compute_dtype, need_normals,
                    brdf, iso_value, lattice):
    """Shared mode epilogue of one (ray-tile, segment) program: output
    head -> (optional) adjoint normal sweep -> TF (piecewise / texture /
    1D-preintegrated / gaussian / rgbo skip) -> (optional) Lambert/
    Blinn-Phong shading -> iso first-crossing OR segment composition.
    Returns the updated (8|16, tile) carry rows. One implementation for
    BOTH fused engines (the per-segment scan kernel and the megakernel),
    mirroring the reference's single-kernel output heads
    (renderer_volume_tensorcores.cuh:1041-1161, renderer_tf_*.cuh,
    renderer_brdf_lambert.cuh:55-105)."""
    rgbo = not output_mode.startswith("density")
    tmin = rays[6:7, :]                        # k0_ray in lattice mode
    tmax = rays[7:8, :]
    grad2 = None
    if need_normals:
        g01 = _mlp_position_grad_T(
            pack, dv_dy, x, rows_t, fourier, w1pos,
            w1cos, w1sin,
            w1lat if has_latent else None,
            hw, w_out,
            activation=activation, act_param=act_param,
            grid_sizes=grid_sizes,
            has_latent_table=has_latent_table,
            compute_dtype=compute_dtype,
            latent_boxfeat=(latent_boxfeat if has_latent else ()))
        # world-space density gradient (pos01 = (x_w - bmin)/bsize).
        # Row extraction via a one-hot selector matmul: Mosaic cannot
        # reshape a sliced row of a (3, N) vector ("unsupported shape
        # cast"), but the (1, N) result of a matmul reshapes fine.
        eye3 = (jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
                ).astype(jnp.float32)
        grad2 = [jnp.dot(eye3[c:c + 1], g01,
                         preferred_element_type=jnp.float32
                         ).reshape(seg, tile) / box_size[c]
                 for c in range(3)]

    tval2 = tval.reshape(seg, tile)
    valid = tval2 <= tmax                      # (1, tile) broadcasts
    if lattice:
        # lattice mode: also mask lattice points before the ray's own
        # first step k0_ray (carried in the tmin packet row); integer
        # compare in f32, exact below 2^24
        valid = valid & (kk.reshape(seg, tile) >= tmin)

    if iso_value is not None:
        # iso epilogue (reference: renderer_ray_evaluation_stepping_iso
        # .cuh:48-214 first-hit march): first crossing this segment via
        # a min-reduction over candidate ts; the found flag rides the
        # alpha carry row so the standard early-out voting stops hit
        # rays. Bisection refinement + shading run OUTSIDE the kernel
        # on the per-ray hits (fused_trace_iso) -- per ray, not per
        # step, so plain JAX is cheap there.
        v2i = value.reshape(seg, tile)
        inside = valid & (v2i > iso_value)
        tcand = jnp.where(inside, tval2, jnp.float32(3.0e38))
        t_hit = jnp.min(tcand, axis=0, keepdims=True)      # (1, tile)
        found_prev = carry[3:4, :] > 0.5
        hit_new = (~found_prev) & (t_hit < 1.0e38)
        depth_row = jnp.where(hit_new, t_hit, carry[0:1, :])
        found_row = jnp.where(hit_new, 1.0,
                              found_prev.astype(jnp.float32))
        return jnp.concatenate(
            [depth_row, carry[1:3, :], found_row, carry[4:8, :]], axis=0)

    inv_range = 1.0 / (density_max - density_min)
    eye4 = (jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
            ).astype(jnp.float32)

    def rows4(flat4):
        # (4, N) -> list of 4 (seg, tile); selector matmul, not a
        # slice (see the grad2 comment above)
        return [jnp.dot(eye4[c:c + 1], flat4,
                        preferred_element_type=jnp.float32
                        ).reshape(seg, tile) for c in range(4)]

    lut4 = _lut4      # module-level helper, shared with the backward

    if rgbo:
        # color field: skip the TF, scale absorption by the stepsize
        # (reference: renderer_ray_evaluation_stepping_dvr.cuh:105-111)
        rgba = rows4(value)
        absorption = rgba[3] * stepsize
        require = valid
        prev_out = carry[4:5, :]
    elif tf_mode in ("texture", "preint1d"):
        # 1D TF texture (reference: renderer_tf_texture.cuh:41-56) and
        # its 1D-preintegrated variant (:62-84) -- semantics mirror
        # transfer.TransferFunctionTexture.eval_normalized exactly
        v2 = value.reshape(seg, tile)
        density2 = (value - density_min) * inv_range          # (1, N)
        d_clip = jnp.clip(density2, 0.0, 1.0)
        tf_all = tf[:]
        plain_tbl = tf_all[0:tf_points, :]
        plain_flat = lut4(plain_tbl, d_clip, tf_points, "texture")
        plain_flat = jnp.concatenate(
            [plain_flat[0:3, :], plain_flat[3:4, :] * stepsize], axis=0)
        if tf_mode == "texture":
            rgba = rows4(plain_flat)
            absorption = rgba[3]
        else:
            # previous density: in-segment step shift + cross-segment
            # carry row 4 (-1 sentinel on the very first step)
            d2s = density2.reshape(seg, tile)
            prev2 = jnp.concatenate([carry[4:5, :], d2s[:seg - 1, :]],
                                    axis=0)
            if lattice:
                # lattice mode evaluates (masked) samples before the
                # ray's own first step k0_ray; their densities must not
                # leak into the prev chain -- the first VALID sample
                # sees the sentinel, like the plain lattice oracle
                first2 = kk.reshape(seg, tile) == tmin
                prev2 = jnp.where(first2, -1.0, prev2)
            prev_flat = prev2.reshape(1, seg * tile)
            prev_eff = jnp.where(prev_flat < 0, d_clip, prev_flat)
            pre_tbl = tf_all[tf_points:tf_points + tf_pre_rows, :]
            vsf = lut4(pre_tbl, prev_eff, tf_pre_rows, "cumulative")
            vsb = lut4(pre_tbl, d_clip, tf_pre_rows, "cumulative")
            denom = d_clip - prev_eff
            near = jnp.abs(denom) < 1e-3
            safe = jnp.where(near, 1.0, denom)
            rgb_p = stepsize * (vsb[0:3, :] - vsf[0:3, :]) / safe
            alpha_p = 1.0 - jnp.exp(
                -stepsize * (vsb[3:4, :] - vsf[3:4, :]) / safe)
            inv_a = jnp.where(alpha_p > 1e-5,
                              1.0 / jnp.maximum(alpha_p, 1e-5), 1.0)
            pre_flat = jnp.concatenate([rgb_p * inv_a, alpha_p], axis=0)
            near4 = jnp.concatenate([near] * 4, axis=0)
            rgba_flat = jnp.where(near4, plain_flat, pre_flat)
            rgba = rows4(rgba_flat)
            # preintegrated alpha is already an opacity -- feed it to
            # the blend unscaled (parity with the plain oracle, which
            # passes eval_normalized's output straight to blend_step)
            absorption = rgba[3]
        require = valid & (v2 >= density_min)
        prev_out = density2.reshape(seg, tile)[seg - 1:seg, :]
    elif tf_mode == "preint2d":
        # 2D preintegration table lookup (reference:
        # renderer_tf_tex2D.cuh tex2D(preintegrated, prev, d)): nearest
        # (i=front, j=back) cell, matching the plain oracle exactly.
        # MXU formulation: per channel plane A_c (R2f, R2b),
        # M_c = A_c @ B with B the back one-hot (R2b, N), then the
        # front one-hot selects rows: val_c = ones @ (F * M_c).
        v2 = value.reshape(seg, tile)
        density2 = (value - density_min) * inv_range          # (1, N)
        d_clip = jnp.clip(density2, 0.0, 1.0)
        d2s = density2.reshape(seg, tile)
        prev2 = jnp.concatenate([carry[4:5, :], d2s[:seg - 1, :]],
                                axis=0)
        if lattice:
            first2 = kk.reshape(seg, tile) == tmin
            prev2 = jnp.where(first2, -1.0, prev2)
        prev_flat = prev2.reshape(1, seg * tile)
        prev_eff = jnp.where(prev_flat < 0, d_clip,
                             jnp.clip(prev_flat, 0.0, 1.0))
        r2 = tf_pre_rows
        fr2 = jnp.float32(r2)
        i_f = jnp.minimum(jnp.floor(prev_eff * fr2), fr2 - 1.0)
        j_b = jnp.minimum(jnp.floor(d_clip * fr2), fr2 - 1.0)
        n_ = d_clip.shape[1]
        iot = jax.lax.broadcasted_iota(jnp.int32, (r2, n_), 0) \
            .astype(jnp.float32)
        fsel = (iot == i_f).astype(jnp.float32)               # (R2, N)
        bsel = (iot == j_b).astype(jnp.float32)
        tf_all = tf[:]
        ones_r = jnp.ones((1, r2), jnp.float32)
        vals = []
        for c in range(4):
            a_c = tf_all[c * r2:(c + 1) * r2, :]              # (R2, R2)
            m_c = jax.lax.dot_general(
                a_c, bsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (R2, N)
            vals.append(jnp.dot(ones_r, fsel * m_c,
                                preferred_element_type=jnp.float32))
        w_a = vals[3]
        inv_a = jnp.where(w_a > 1e-5, 1.0 / jnp.maximum(w_a, 1e-5), 1.0)
        rgba_flat = jnp.concatenate(
            [vals[0] * inv_a, vals[1] * inv_a, vals[2] * inv_a, w_a],
            axis=0)
        rgba = rows4(rgba_flat)
        absorption = rgba[3]        # already an opacity (premultiplied)
        require = valid & (v2 >= density_min)
        prev_out = density2.reshape(seg, tile)[seg - 1:seg, :]
    elif tf_mode == "gaussian":
        # sum-of-gaussians TF (reference: renderer_tf_gaussian.cuh:
        # 36-88, plain mode): per-gaussian weights broadcast over the
        # sample row, one (4, G) x (G, N) contraction for the colors
        v2 = value.reshape(seg, tile)
        density2 = (value - density_min) * inv_range          # (1, N)
        d_clip = jnp.clip(density2, 0.0, 1.0)
        tfg = tf[:]                                            # (G, 6)
        mu = tfg[:, 4:5]
        sg = tfg[:, 5:6]
        wg = jnp.exp(-((d_clip - mu) ** 2) / (sg * sg))        # (G, N)
        rgba_flat = jax.lax.dot_general(
            tfg[:, 0:4], wg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (4, N)
        rgba = rows4(rgba_flat)
        absorption = rgba[3] * stepsize
        require = valid & (v2 >= density_min)
        prev_out = density2.reshape(seg, tile)[seg - 1:seg, :]
    else:
        # dense (seg, tile) layout for the epilogue: the (1, N) row uses
        # 1/8 of each vreg's sublanes; reshaped, TF + compositing run
        # dense
        v2 = value.reshape(seg, tile)
        rgba, absorption, density2 = _piecewise_tf(
            v2, tf, tf_points=tf_points, density_min=density_min,
            density_max=density_max, stepsize=stepsize)
        require = valid & (v2 >= density_min)
        prev_out = density2[seg - 1:seg, :]

    n_safe = None
    if need_normals:
        gns = grad2[0] ** 2 + grad2[1] ** 2 + grad2[2] ** 2
        inv_gn = jax.lax.rsqrt(jnp.maximum(gns, 1e-20))
        nz_mask = gns > 1e-12
        n_safe = [jnp.where(nz_mask, g * inv_gn, 0.0) for g in grad2]
    if brdf:
        # Lambert/Blinn-Phong shading + gradient-magnitude opacity
        # scaling (reference: renderer_brdf_lambert.cuh:55-105)
        (en_ms, en_phong, mag_scaling, ambient, specular, mag_center,
         mag_radius, light_is_dir, lx, ly, lz, spec_exp) = brdf
        nrm = n_safe
        if en_ms:
            absorption = absorption * (
                1.0 - jnp.exp(-mag_scaling * gns))
        if en_phong:
            if light_is_dir:
                ln = float(np.sqrt(lx * lx + ly * ly + lz * lz))
                ld = [-lx / ln, -ly / ln, -lz / ln]
            else:
                # world positions rebuilt by broadcast ((1,tile) rows x
                # (seg,tile) tval2): Mosaic cannot reshape sliced rows
                pw = [rays[c:c + 1, :] + tval2 * rays[3 + c:4 + c, :]
                      for c in range(3)]
                lvec = [lx - pw[0], ly - pw[1], lz - pw[2]]
                ll = jax.lax.rsqrt(jnp.maximum(
                    lvec[0] ** 2 + lvec[1] ** 2 + lvec[2] ** 2, 1e-20))
                ld = [v * ll for v in lvec]
            gn = jnp.sqrt(jnp.maximum(gns, 1e-20))
            t01 = jnp.clip((gn - (mag_center - mag_radius))
                           / (2.0 * mag_radius), 0.0, 1.0)
            phong = t01 * t01 * (3.0 - 2.0 * t01)
            amb = 1.0 + (ambient - 1.0) * phong
            ndotl = nrm[0] * ld[0] + nrm[1] * ld[1] + nrm[2] * ld[2]
            diffuse = [jnp.abs(ndotl) * rgba[c] for c in range(3)]
            # reflect(ld, -n) = ld - 2*dot(-n, ld)*(-n) = ld - 2*(n.ld)n
            refl = [ld[c] - 2.0 * ndotl * nrm[c] for c in range(3)]
            # per-ray direction (1, tile) broadcasts over the seg axis
            rdotr = (rays[3:4, :] * refl[0] + rays[4:5, :] * refl[1]
                     + rays[5:6, :] * refl[2])
            base_s = jnp.maximum(0.0, rdotr)
            spec = jnp.ones_like(base_s)
            e = int(spec_exp)
            sq = base_s
            while e:                      # integer power by squaring
                if e & 1:
                    spec = spec * sq
                sq = sq * sq
                e >>= 1
            spec = ((spec_exp + 2) * 0.159155) * spec
            rgba[:3] = [amb * rgba[c] + (1.0 - amb)
                        * (diffuse[c] + specular * spec)
                        for c in range(3)]

    seg_c, seg_a = _compose_tree(rgba, absorption, require, seg,
                                 blend_beer=blend_beer,
                                 normals=n_safe, tval2=tval2)
    alpha = carry[3:4, :]
    w0 = 1.0 - alpha
    rows = [carry[0:1, :] + w0 * seg_c[0],
            carry[1:2, :] + w0 * seg_c[1],
            carry[2:3, :] + w0 * seg_c[2],
            alpha + w0 * seg_a,
            prev_out]
    if need_normals:
        rows += [carry[5:6, :] + w0 * seg_c[3],
                 carry[6:7, :] + w0 * seg_c[4],
                 carry[7:8, :] + w0 * seg_c[5],
                 carry[8:9, :] + w0 * seg_c[6],
                 carry[9:16, :]]
    else:
        rows.append(carry[5:8, :])
    return jnp.concatenate(rows, axis=0)


def _lut4_weights(s_flat: Array, r: int, convention: str):
    """Index/fraction geometry of the lerped 1D TF texture fetch
    (shared by the forward :func:`_lut4` and the backward's LUT
    adjoint). Returns (lo, hi, f, dx_ds): lo/hi (1, N) f32 texel
    indices, f the lerp fraction, dx_ds the constant d(index)/d(s)
    (clamped ends get zero slope automatically since tbl[hi]-tbl[lo]
    vanishes when lo == hi)."""
    if convention == "texture":        # x = s*r - 0.5, clamped ends
        x = s_flat * float(r) - 0.5
        i0 = jnp.floor(x)
        f = x - i0
        lo = jnp.clip(i0, 0.0, float(r - 1))
        hi = jnp.clip(i0 + 1.0, 0.0, float(r - 1))
        dx_ds = float(r)
    else:                              # cumulative: x = clip(s)*r'
        x = jnp.clip(s_flat, 0.0, 1.0) * float(r - 1)
        lo = jnp.clip(jnp.floor(x), 0.0, float(r - 2))
        f = x - lo
        hi = lo + 1.0
        dx_ds = float(r - 1)
    return lo, hi, f, dx_ds


def _lut4(tbl: Array, s_flat: Array, r: int, convention: str) -> Array:
    """Lerped 1D rgba-table lookup as a weight-matrix matmul (the
    TPU answer to the reference's 1D TF texture fetch,
    renderer_tf_texture.cuh:41-56): Mosaic has no per-lane gather,
    but a (rows, N) interpolation-weight one-hot costs one compare
    pass and the contraction runs on the MXU. tbl (rows, 8) value,
    s_flat (1, N) -> (8, N)."""
    lo, hi, f, _ = _lut4_weights(s_flat, r, convention)
    iot = jax.lax.broadcasted_iota(
        jnp.int32, (tbl.shape[0], s_flat.shape[1]), 0).astype(
        jnp.float32)
    w = jnp.where(iot == lo, 1.0 - f, 0.0) \
        + jnp.where(iot == hi, f, 0.0)
    return jax.lax.dot_general(
        tbl.astype(jnp.float32), w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pad_tf(tf_tensor: Array) -> Array:
    """(R, C<=8) -> (R, 8) lane-pad for a clean VMEM layout (the
    backward's texture-LUT adjoint relies on the fixed 8 width)."""
    t = jnp.asarray(tf_tensor, jnp.float32)
    r, c = t.shape
    if c == 8:
        return t
    return jnp.concatenate([t, jnp.zeros((r, 8 - c), t.dtype)], axis=1)


def _prepare_tf(tf_tensor: Array, tf_mode: str, tf_pre):
    """Kernel TF tensor per mode: (tf_pad, tf_points, tf_pre_rows).
    Shared by both fused engines (preint1d stacks the cumulative table
    below the plain table; reference: renderer_tf_texture.cuh:62-84)."""
    if tf_mode == "piecewise":
        return _pad_tf(tf_tensor), tf_tensor.shape[0], 0
    if tf_mode == "texture":
        # lane-pad to (R, 8): the backward's LUT adjoint accumulates
        # the d_table contraction at the fixed 8 width
        return _pad_tf(tf_tensor), tf_tensor.shape[0], 0
    if tf_mode == "gaussian":
        return (jnp.asarray(tf_tensor, jnp.float32),  # (G, 6)
                tf_tensor.shape[0], 0)
    if tf_mode == "preint1d":
        if tf_pre is None:
            raise ValueError("tf_mode='preint1d' needs tf_pre (the "
                             "cumulative table from with_preintegration)")
        plain_t = jnp.asarray(tf_tensor, jnp.float32)
        pre_t = jnp.asarray(tf_pre, jnp.float32)
        total = plain_t.shape[0] + pre_t.shape[0]
        pad = (-total) % 8
        tf_pad = jnp.concatenate(
            [plain_t, pre_t] + ([jnp.zeros((pad, 4), jnp.float32)]
                                if pad else []), axis=0)
        # lane-pad to 8 like the texture mode (the backward's LUT
        # adjoints contract at the fixed 8 width)
        return _pad_tf(tf_pad), plain_t.shape[0], pre_t.shape[0]
    if tf_mode == "preint2d":
        # full 2D table over (front, back) density pairs
        # (reference: renderer_tf_tex2D.cuh + Compute2DPreintegration-
        # Table, transfer_function.h:283-286): packed channel-major as
        # (4*R2, R2) so the kernel contracts each channel plane on the
        # MXU; the plain table is unused in this mode (the oracle,
        # TransferFunctionTexture.eval_normalized mode 2, reads the
        # table for every sample incl. the first via prev := d)
        if tf_pre is None or tf_pre.ndim != 3:
            raise ValueError("tf_mode='preint2d' needs tf_pre = the "
                             "(R2, R2, 4) table from "
                             "with_preintegration_2d")
        pre_t = jnp.asarray(tf_pre, jnp.float32)
        r2 = pre_t.shape[0]
        packed = jnp.concatenate([pre_t[..., c] for c in range(4)],
                                 axis=0)                     # (4*R2, R2)
        return packed, r2, r2
    raise ValueError(f"unknown tf_mode {tf_mode!r} "
                     "(piecewise|texture|preint1d|preint2d|gaussian)")


def _brdf_tuple(brdf, need_normals: bool) -> tuple:
    """Static BRDF parameter tuple baked into the kernels (shared by
    both fused engines; reference: renderer_brdf_lambert.cuh:55-105)."""
    if brdf is None or not (brdf.enable_phong
                            or brdf.enable_magnitude_scaling):
        return ()
    if not need_normals:
        raise ValueError("brdf shading requires need_normals=True")
    lp = np.asarray(brdf.light_parameter, np.float32)
    return (bool(brdf.enable_magnitude_scaling),
            bool(brdf.enable_phong),
            float(np.asarray(brdf.magnitude_scaling)),
            float(np.asarray(brdf.ambient)),
            float(np.asarray(brdf.specular)),
            float(np.asarray(brdf.magnitude_center)),
            float(np.asarray(brdf.magnitude_radius)),
            brdf.light_type == "direction",
            float(lp[0]), float(lp[1]), float(lp[2]),
            int(brdf.specular_exponent))


def _weight_list(w: FusedWeights, tf_pad: Array) -> list:
    f = w.fourier.shape[0]
    out = [w.fourier,
           w.fourier_dir if w.fourier_dir is not None
           else jnp.zeros((f, 3), w.fourier.dtype),
           w.w1_pos,
           w.w1_dir if w.w1_dir is not None
           else jnp.zeros((w.b1.shape[0], 3), w.b1.dtype),
           w.w1_cos, w.w1_sin]
    out.append(w.w1_lat if w.w1_lat is not None
               else jnp.zeros((w.b1.shape[0], 8), w.b1.dtype))
    out.append(w.b1)
    out.extend(w.hidden_w)
    out.extend(w.hidden_b)
    out.extend([w.w_out, w.b_out, tf_pad])
    return out


def fused_trace_dvr(ray_start: Array, ray_dir: Array,
                    net: SceneRepresentationNetwork,
                    box_min, box_size,
                    tf_tensor: Array, *,
                    stepsize: float, max_steps: int,
                    density_min: float = 0.0, density_max: float = 1.0,
                    blend_mode: str = "beer_lambert",
                    alpha_early_out: float = 0.999,
                    enable_early_out: bool = True,
                    seg: Optional[int] = 32, tile: Optional[int] = 256,
                    compute_dtype=jnp.float32,
                    differentiable: bool = False,
                    latent_mode: str = "table",
                    table_dtype=jnp.float32,
                    subbox=0,
                    need_normals: bool = False,
                    brdf=None,
                    time=0.0, ensemble=0.0,
                    stash_backward: bool = False,
                    segment_remat: bool = False,
                    iso_value=None,
                    tf_mode: str = "piecewise",
                    tf_pre: Optional[Array] = None,
                    tmax_clip: Optional[Array] = None,
                    tmin_clip: Optional[Array] = None,
                    interpret: bool = False):
    """Fused DVR through an SRN. Returns rgba (R, 4), or a
    ``RayEvaluationOutput`` (color, blended normal, depth) when
    ``need_normals`` -- the in-kernel adjoint normal + shading path
    (``brdf``: an optional BRDFLambert whose leaves must be concrete;
    its parameters are baked into the kernel like the box).

    Semantics match ``trace_dvr`` over a ``VolumeInterpolationNetwork``
    with need_normals=False (verified allclose in tests/test_fused.py).

    ``seg=None``/``tile=None`` auto-sizes the kernel program from the
    VMEM budget via :func:`choose_fused_config` (the ``computeMaxWarps``
    analog).

    ``time``/``ensemble`` (traced scalars) condition time/ensemble-
    keyframed latent grids: the bracketing keyframe grids are pre-lerped
    into ONE static grid per frame (exact -- trilerp is linear in grid
    values; :func:`fvsrn_tpu.models.latent.resolve_grid`), so every
    latent mode (table / subbox / boxfeat) serves keyframed SRNs
    unchanged and gradients flow to both bracketing keyframes
    (reference: LatentGridTimeAndEnsemble,
    volume_interpolation_network.h:318-434; in-march keyframe texture
    lerp, renderer_volume_tensorcores.cuh:903-948).
    ``differentiable=True`` uses a fixed-count segment scan (reverse-AD via
    per-segment rematerialization); the default runs a while_loop that
    stops once every ray saturated or left the box.

    ``latent_mode="boxfeat"`` is the fast latent path (v2): sampling
    switches to the global step LATTICE (t = k*stepsize, first sample
    at ceil(tmin/h) -- a sub-step phase shift vs the reference's
    per-ray start; compare against ``trace_dvr(..., lattice=True)``),
    which makes a coherent pixel-block ray tile span only a few latent
    cells per (tile, segment). The gather then fetches one small raw-
    value sub-box per (tile, segment) and the kernel resolves the
    trilerp with factorized per-axis weights (one small matmul per
    x-block + a weighted block-sum; see :func:`_boxfeat_features`),
    emitting interpolated features directly. The backward emits dense
    per-tile sub-box gradients (tiny scatter). ``subbox`` then carries
    the static :class:`BoxfeatSpec` (or ``"auto"``/0 to certify from
    concrete rays via :func:`certify_boxfeat`). REQUIRES spatially
    coherent ray tiles (``block_ray_permutation``).

    ``subbox`` (with ``latent_mode="table"``) activates the one-hot
    sub-box latent path (v1): per (ray-tile, segment)
    the latent gather fetches ONE small (szx, szy, szz) corner sub-box
    instead of a 128-lane row per sample, and the kernel resolves rows
    in-VMEM with a one-hot MXU contraction (see ``_latent_features``).
    Cuts the latent-grid HBM traffic by ~(seg*tile)/(szx*szy*szz) and in
    the backward replaces both the scatter-row compaction and most of
    the XLA scatter. REQUIRES spatially coherent ray tiles (see
    ``block_ray_permutation``) and a size that covers the true footprint:
    pass ``subbox="auto"`` with concrete rays (``certify_subbox``), an
    int (cubic), or a per-axis (szx, szy, szz) tuple. Samples whose
    corner falls outside the sub-box are silently clamped to it -- the
    caller must certify the size.

    The differentiable latent-grid gradient uses in-kernel run compaction
    when the per-segment voxel-crossing bound allows it; the bound assumes
    ``ray_dir`` is normalized (||d|| <= 1, as produced by generate_rays).
    Unnormalized directions may silently drop latent-gradient
    contributions on the compacted path.
    """
    r_total = ray_start.shape[0]
    dtype = jnp.float32
    try:
        # the kernel bakes the box as python floats (jit-static); grab them
        # before any jnp conversion (constants become tracers under trace)
        bmin_t = tuple(float(v) for v in np.asarray(box_min))
        bsize_t = tuple(float(v) for v in np.asarray(box_size))
    except Exception as e:
        raise ValueError("fused_trace_dvr requires concrete (non-traced) "
                         "box_min/box_size") from e
    ray_start = jnp.asarray(ray_start, dtype)
    ray_dir = jnp.asarray(ray_dir, dtype)
    box_min = jnp.asarray(np.asarray(box_min), dtype)
    box_size = jnp.asarray(np.asarray(box_size), dtype)
    tmin, tmax = intersect_aabb(ray_start, ray_dir, box_min, box_size)
    tmin = jnp.maximum(tmin, 0.0)
    if tmax_clip is not None:
        # saturation-clamped march (probe_saturation_tmax): the
        # reference's early-out truncation, decided at plan time
        tmax = jnp.minimum(tmax, jnp.asarray(tmax_clip, dtype)
                           .reshape(tmax.shape))
    if tmin_clip is not None:
        # entry empty-space clip (probe_entry_tmin): the march starts
        # past each ray's leading transparent prefix; in lattice mode
        # k0_ray advances, in per-ray-start mode the phase shifts --
        # both match trace_dvr(..., tmin_in=...)
        tmin = jnp.maximum(tmin, jnp.asarray(tmin_clip, dtype)
                           .reshape(tmin.shape))

    # 1D latent vectors fold into the first-layer bias at this frame's
    # (time, ensemble) -- extract_weights docstring; grids stay per-sample
    weights = extract_weights(net, jnp.float32, time=time,
                              ensemble=ensemble)
    has_latent = weights.w1_lat is not None
    # time/ensemble-keyframed grids collapse to one static grid per frame
    # (exact: trilerp is linear in grid values; see models.latent.resolve_grid)
    latent_grid = resolve_grid(net.latent, time, ensemble) \
        if has_latent else None
    cl = weights.w1_lat.shape[1] if has_latent else 8
    use_table = has_latent and latent_mode == "table" and cl <= 16
    use_boxfeat = has_latent and latent_mode == "boxfeat" and cl <= 16
    if seg is None or tile is None:
        a_seg, a_tile = choose_fused_config(
            hidden=weights.b1.shape[0],
            n_layers=1 + len(weights.hidden_w),
            num_fourier=weights.fourier.shape[0],
            latent_channels=cl if has_latent else 0,
            table_dtype=table_dtype, latent_mode=latent_mode,
            differentiable=differentiable, need_normals=need_normals)
        seg = seg or a_seg
        tile = tile or a_tile
    if r_total % tile != 0:
        raise ValueError(f"ray count {r_total} must be a multiple of "
                         f"tile={tile} (pad the rays)")
    grid_sizes = (1, 1, 1)
    table = None
    p6 = None
    nxb_tot = 1
    if use_table or use_boxfeat:
        latent_grid = jnp.asarray(latent_grid, jnp.float32)
        _, gd, gh, gw = latent_grid.shape
        grid_sizes = (gw, gh, gd)  # (x, y, z) voxel counts
        w1l = weights.w1_lat
        if cl < 16:
            w1l = jnp.concatenate(
                [w1l, jnp.zeros((w1l.shape[0], 16 - cl), w1l.dtype)],
                axis=1)
        if use_table:
            table = build_neighborhood_table(latent_grid).astype(
                table_dtype)
            # first-layer latent block tiled over the 8 corner slots,
            # channels zero-padded to 16: (H, 128)
            weights = weights._replace(w1_lat=jnp.tile(w1l, (1, 8)))
        else:
            # boxfeat: raw-value padded grid; the kernel emits
            # interpolated (16, N) features, so the first-layer latent
            # block stays (H, 16)
            nxb_tot = (gw + 2 + 7) // 8
            p6 = build_boxfeat_grid(latent_grid, nxb_tot).astype(
                table_dtype)
            weights = weights._replace(w1_lat=w1l)

    n_seg = (max_steps + seg - 1) // seg
    n_tiles = r_total // tile
    n_samples = seg * tile
    tf_pad, tf_points, tf_pre_rows = _prepare_tf(tf_tensor, tf_mode,
                                                 tf_pre)

    # resolve the sub-box latent mode (see docstring)
    subbox_t = ()
    sub_offsets = None
    if use_table and subbox:
        if subbox == "auto":
            sizes = certify_subbox(
                ray_start, ray_dir, grid_sizes, box_min, box_size,
                stepsize=stepsize, max_steps=max_steps, seg=seg, tile=tile)
        elif isinstance(subbox, int):
            sizes = (subbox, subbox, subbox)
        else:
            sizes = tuple(int(v) for v in subbox)
        szx = min(sizes[0], grid_sizes[0] + 1)
        szy = min(sizes[1], grid_sizes[1] + 1)
        szz = min(sizes[2], grid_sizes[2] + 1)
        sz3 = szx * szy * szz
        # pad the row count to the coarsest sublane tile (32 covers int8)
        sz3p = ((sz3 + 31) // 32) * 32
        subbox_t = (szx, szy, szz, sz3p)
        li = np.arange(sz3p, dtype=np.int64)
        lz = np.where(li < sz3, li // (szy * szx), 0)
        ly = np.where(li < sz3, (li // szx) % szy, 0)
        lx = np.where(li < sz3, li % szx, 0)
        sub_offsets = (jnp.asarray(lx, jnp.int32),
                       jnp.asarray(ly, jnp.int32),
                       jnp.asarray(lz, jnp.int32))

    # resolve the boxfeat latent mode: certify (or accept) the static
    # footprint spec, switch to lattice-aligned sampling
    boxfeat_t = ()
    bf_offsets = None
    if use_boxfeat:
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
        boxfeat_t = (bf_spec.szxc, bf_spec.szyc, bf_spec.szzc,
                     bf_spec.nxb, bf_spec.szycp)
        bf_offsets = _boxfeat_row_offsets(bf_spec)
        n_seg = bf_spec.n_seg

    rgbo = not net.output_mode.startswith("density")
    # every TF mode differentiates in-kernel (preint2d trains its
    # table only -- the nearest-cell lookup has zero density gradient,
    # matching jax.grad of the plain oracle)
    if iso_value is not None and (differentiable or need_normals or rgbo):
        raise ValueError("fused iso marching: forward-only density "
                         "networks (shading happens outside the kernel)")
    if differentiable and need_normals:
        raise NotImplementedError(
            "differentiable fused path: no normals/shading (use the "
            "plain-JAX oracle for shaded losses)")
    if need_normals and rgbo:
        raise ValueError("normals are only defined for density networks")
    brdf_t = _brdf_tuple(brdf, need_normals)
    crows = 16 if need_normals else 8

    n_hidden = len(weights.hidden_w)
    static_kwargs = dict(
        activation=net.layers[0].activation,
        act_param=net.layers[0].activation_param,
        output_mode=net.output_mode,
        has_direction=net.input.has_direction,
        need_normals=need_normals,
        brdf=brdf_t,
        has_latent=has_latent,
        latent_table=use_table,
        grid_sizes=grid_sizes,
        tf_points=tf_points,
        blend_beer=(blend_mode == "beer_lambert"),
        seg=seg, tile=tile,
        density_min=float(density_min), density_max=float(density_max),
        stepsize=float(stepsize),
        # differentiable mode has NO early-out semantics (fixed-count
        # scan, no in-segment gating in the forward body), so the
        # backward replay must not gate on alpha either -- otherwise the
        # adjoint differentiates a different function than the forward
        # computes for any ray that saturates mid-march (round-1 bug:
        # fwd composited everything, bwd replay gated on early_alpha)
        early_alpha=(float(alpha_early_out)
                     if enable_early_out and not differentiable else 2.0),
        box_min=bmin_t, box_size=bsize_t,
        compute_dtype=compute_dtype,
        latent_subbox=subbox_t,
        latent_boxfeat=boxfeat_t,
        iso_value=(float(iso_value) if iso_value is not None else None),
        tf_mode=tf_mode,
        tf_pre_rows=tf_pre_rows,
    )
    kernel = functools.partial(_segment_kernel, n_hidden=n_hidden,
                               **static_kwargs)

    wlist = _weight_list(weights, tf_pad)
    if boxfeat_t:
        bf_rows = boxfeat_t[3] * boxfeat_t[4]      # nxb * szycp
        lat_spec = pl.BlockSpec((bf_rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    elif subbox_t:
        lat_spec = pl.BlockSpec((subbox_t[3], 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    elif use_table:
        lat_spec = pl.BlockSpec((n_samples, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        lat_spec = pl.BlockSpec((1, cl, n_samples), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [
        # segment index scalar
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        # rays packet (8, R)
        pl.BlockSpec((8, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        # latent: sub-box rows (n_tiles*SZ3P, 128), table rows
        # (n_tiles*seg*tile, 128), or features (n_tiles, CL, seg*tile)
        lat_spec,
    ] + ([
        # per-sample local sub-box row index (n_tiles, 1, N)
        pl.BlockSpec((1, 1, n_samples), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] if subbox_t else []) + ([
        # boxfeat per-(tile, segment) scalars [base_y, base_z, xb0, K0]
        pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ] if boxfeat_t else []) + [
        # carry (8|16, R)
        pl.BlockSpec((crows, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, (lambda i, n=w.ndim: (0,) * n),
                     memory_space=pltpu.VMEM)
        for w in wlist
    ]
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((crows, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((crows, r_total), dtype),
        interpret=interpret,
    )

    k0_ray = jnp.ceil(tmin / stepsize)       # (R, 1) first lattice step
    k0t = k0_ray.reshape(n_tiles, tile).min(axis=1)  # (n_tiles,)
    if boxfeat_t:
        # lattice mode: the packet's tmin row carries k0_ray instead
        # (the kernel's lower validity bound; t rebuilt from K0)
        rays_packet = jnp.concatenate(
            [ray_start.T, ray_dir.T, k0_ray.T, tmax.T], axis=0)
    else:
        rays_packet = jnp.concatenate(
            [ray_start.T, ray_dir.T, tmin.T, tmax.T], axis=0)  # (8, R)
    rs_tiles = ray_start.reshape(n_tiles, 1, tile, 3)
    rd_tiles = ray_dir.reshape(n_tiles, 1, tile, 3)
    tmin_tiles = tmin.reshape(n_tiles, 1, tile)

    def _tile_major_pos01(s):
        # (n_tiles, seg, tile, 3) positions without any transposes
        j = jnp.arange(seg, dtype=dtype).reshape(1, seg, 1)
        t = tmin_tiles + (s.astype(dtype) * seg + j) * stepsize
        pos = rs_tiles + rd_tiles * t[..., None]
        return (pos - box_min) / box_size

    def _segment_rows(s):
        # (n_tiles, seg, tile) int32 neighborhood-table row per sample
        pos01 = _tile_major_pos01(s)
        gsz = jnp.asarray(grid_sizes, dtype)
        v = pos01 * gsz - 0.5
        i0 = jnp.floor(v).astype(jnp.int32)
        b = jnp.clip(i0 + 1, 0, jnp.asarray(grid_sizes, jnp.int32))
        gw_, gh_, gd_ = grid_sizes
        return (b[..., 2] * (gh_ + 1) + b[..., 1]) * (gw_ + 1) + b[..., 0]

    def _segment_subbox(s):
        """Per-tile sub-box gather rows + per-sample local row indices.

        Returns (gr, lrow): gr (n_tiles, SZ3P) int32 global table rows
        (padding repeats the base row -- never selected, adds zero in
        the backward scatter); lrow (n_tiles, 1, N) f32 local rows.
        """
        szx, szy, szz, _ = subbox_t
        gw_, gh_, gd_ = grid_sizes
        pos01 = _tile_major_pos01(s)
        res_arr = jnp.asarray(grid_sizes, jnp.int32)
        v = pos01 * jnp.asarray(grid_sizes, dtype) - 0.5
        b = jnp.clip(jnp.floor(v).astype(jnp.int32) + 1, 0, res_arr)
        base = jnp.min(b, axis=(1, 2))            # (n_tiles, 3) x,y,z
        limit = jnp.asarray(
            [gw_ + 1 - szx, gh_ + 1 - szy, gd_ + 1 - szz], jnp.int32)
        base = jnp.minimum(base, limit)
        szm1 = jnp.asarray([szx - 1, szy - 1, szz - 1], jnp.int32)
        loc = jnp.clip(b - base[:, None, None, :], 0, szm1)
        lrow = (loc[..., 2] * szy + loc[..., 1]) * szx + loc[..., 0]
        ox, oy, oz = sub_offsets                  # (SZ3P,) each
        gr = ((base[:, 2:3] + oz[None, :]) * (gh_ + 1)
              + (base[:, 1:2] + oy[None, :])) * (gw_ + 1) \
            + (base[:, 0:1] + ox[None, :])        # (n_tiles, SZ3P)
        return gr, lrow.reshape(n_tiles, 1, n_samples).astype(jnp.float32)

    def _segment_boxfeat(s):
        """Per-(tile, segment) sub-box gather rows + kernel scalars.

        Endpoint bound (positions monotone in t per axis): the tile's
        valid-sample footprint this segment is covered by the per-ray
        clamped lattice endpoints; rays with no valid sample are
        excluded. Base backs off one cell (clamped) as float-divergence
        headroom; ``certify_boxfeat``'s margin pays for it.
        """
        szxc, szyc, szzc, nxb, szycp = boxfeat_t
        gw_, gh_, gd_ = grid_sizes
        sf = s.astype(dtype)
        ka = k0t + sf * seg                       # (n_tiles,)
        k0_t2 = k0_ray.reshape(n_tiles, tile)
        tmax_t2 = tmax.reshape(n_tiles, tile)
        ta = jnp.maximum(k0_t2, ka[:, None]) * stepsize
        tb = jnp.minimum(tmax_t2, (ka[:, None] + (seg - 1)) * stepsize)
        alive = ta <= tb
        res_i = jnp.asarray(grid_sizes, jnp.int32)
        res_f = jnp.asarray(grid_sizes, dtype)
        rs3 = ray_start.reshape(n_tiles, tile, 3)
        rd3 = ray_dir.reshape(n_tiles, tile, 3)
        bs = []
        for t in (ta, tb):
            ps = rs3 + rd3 * t[..., None]
            v = (ps - box_min) / box_size * res_f - 0.5
            bs.append(jnp.clip(jnp.floor(v).astype(jnp.int32) + 1,
                               0, res_i))
        blo = jnp.where(alive[..., None], jnp.minimum(*bs),
                        jnp.int32(10 ** 6)).min(axis=1)  # (n_tiles, 3)
        base_x = jnp.maximum(blo[:, 0] - 1, 0)
        xb0 = jnp.clip(base_x // 8, 0, nxb_tot - nxb)
        base_y = jnp.clip(blo[:, 1] - 1, 0, gh_ + 2 - szyc)
        base_z = jnp.clip(blo[:, 2] - 1, 0, gd_ + 2 - szzc)
        oz, oy = bf_offsets                        # numpy (szycp,) each
        rows_zy = (((base_z[:, None] + oz[None, :]) * (gh_ + 2)
                    + (base_y[:, None] + oy[None, :])) * nxb_tot)
        rows = rows_zy[:, None, :] + (
            xb0[:, None, None]
            + jnp.arange(nxb, dtype=jnp.int32)[None, :, None])
        rows = rows.reshape(n_tiles, nxb * szycp)  # parts contiguous
        base_pack = jnp.stack(
            [base_y.astype(dtype), base_z.astype(dtype),
             xb0.astype(dtype), k0t],
            axis=1).reshape(n_tiles, 1, 4)         # f32 scalars
        return rows, base_pack

    def _segment_latent(s):
        if use_table:
            row = _segment_rows(s)
            # indices are pre-clipped: promise_in_bounds elides the
            # gather's clamp/select epilogue (measured 3.3 ms/segment)
            return table.at[row.reshape(-1)].get(
                mode="promise_in_bounds")  # (M, 128)
        elif has_latent:
            pos01 = _tile_major_pos01(s)
            f = grid_sample_3d(latent_grid, pos01).astype(dtype)
            return f.transpose(0, 3, 1, 2).reshape(n_tiles, cl, n_samples)
        return jnp.zeros((n_tiles, cl, n_samples), dtype)

    def run_segment(s, carry):
        s_arr = jnp.reshape(s, (1, 1)).astype(jnp.float32)
        if boxfeat_t:
            rows, base_pack = _segment_boxfeat(s)
            sub = p6.at[rows.reshape(-1)].get(mode="promise_in_bounds")
            return call(s_arr, rays_packet, sub, base_pack, carry,
                        *wlist)
        if subbox_t:
            gr, lrow = _segment_subbox(s)
            sub = table.at[gr.reshape(-1)].get(mode="promise_in_bounds")
            return call(s_arr, rays_packet, sub, lrow, carry, *wlist)
        lat = _segment_latent(s)
        return call(s_arr, rays_packet, lat, carry, *wlist)

    carry0 = jnp.zeros((crows, r_total), dtype)
    carry0 = carry0.at[4, :].set(-1.0)  # prev-density sentinel

    if differentiable:
        from .fused_dvr_bwd import make_segment_op
        if boxfeat_t:
            lat_shape = (n_tiles * boxfeat_t[3] * boxfeat_t[4], 128)
        elif subbox_t:
            lat_shape = (n_tiles * subbox_t[3], 128)
        elif use_table:
            lat_shape = (n_tiles * n_samples, 128)
        else:
            lat_shape = (n_tiles, cl, n_samples)
        lat_dtype = table_dtype if (use_table or use_boxfeat) else dtype

        # In-kernel run compaction of the latent-grid gradient scatter:
        # consecutive march steps share a base voxel, and for a
        # NORMALIZED direction the distinct-voxel count per ray per
        # segment is <= 4 + floor(||K||_2) with
        # K_i = seg*stepsize*res_i/box_i (per-axis crossings + phase).
        # The backward kernel then reduces seg per-step rows to `slots`
        # slot rows, shrinking the XLA scatter (measured: the scatter,
        # not the sort order, dominates the backward -- see PERF.md).
        # The sub-box path supersedes it: dense per-tile sub-box
        # gradients via the transposed one-hot contraction.
        compact_slots = 0
        if use_table and not subbox_t:
            k_vec = [seg * float(stepsize) * grid_sizes[i] / bsize_t[i]
                     for i in range(3)]
            runs_max = 4 + int(np.floor(np.sqrt(sum(k * k
                                                    for k in k_vec))))
            slots = ((runs_max + 7) // 8) * 8
            if slots * 2 <= seg:
                compact_slots = slots

        # activation-stash backward (OFF by default -- a measured dead
        # end on v5e, PERF.md): the forward kernel additionally emits
        # per-layer activations + derivatives and the fourier sincos,
        # making the backward transcendental-free; but streaming the
        # ~900 B/sample stash through HBM costs ~2x the VPU trig it
        # saves (0.68 s vs 0.52 s fwd+bwd at the flagship). Kept behind
        # ``stash_backward=True`` for parts with different
        # bandwidth/compute ratios.
        hidden_n = int(weights.b1.shape[0])
        stash_rows = 0
        if stash_backward and hidden_n % 8 == 0:
            stash_rows = _stash_rows(int(weights.fourier.shape[0]),
                                     hidden_n, n_hidden)
        if stash_rows:
            kernel_fwd_diff = functools.partial(
                _segment_kernel, n_hidden=n_hidden, want_stash=True,
                **static_kwargs)
            grid_spec_diff = pl.GridSpec(
                grid=(n_tiles,),
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((crows, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((stash_rows, n_samples),
                                 lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)))
        else:
            kernel_fwd_diff = kernel
            grid_spec_diff = grid_spec

        seg_op = make_segment_op(
            kernel_fwd=kernel_fwd_diff, grid_spec_fwd=grid_spec_diff,
            r_total=r_total, n_tiles=n_tiles, n_samples=n_samples,
            seg=seg, tile=tile, cl=cl, use_table=use_table,
            has_latent=has_latent, n_hidden=n_hidden,
            kernel_kwargs=static_kwargs, lat_shape=lat_shape,
            lat_dtype=lat_dtype, interpret=interpret,
            compact_slots=compact_slots,
            table_shape=(p6.shape if boxfeat_t
                         else None if table is None else table.shape),
            table_dtype=table_dtype, stash_rows=stash_rows)

        if boxfeat_t:
            p6_ng = jax.lax.stop_gradient(p6)

            def body(carry, s):
                rows, base_pack = _segment_boxfeat(s)
                sub = p6_ng.at[rows.reshape(-1)].get(
                    mode="promise_in_bounds")
                # f32 row indices: custom-vjp inputs need float
                # cotangents (rows < 2^24, exact in f32)
                gr_f = rows.astype(jnp.float32)
                s_arr = jnp.reshape(s, (1, 1)).astype(jnp.float32)
                return seg_op(s_arr, rays_packet, sub, base_pack, gr_f,
                              p6, carry, weights, tf_pad), None
        elif subbox_t:
            table_ng = jax.lax.stop_gradient(table)

            def body(carry, s):
                gr, lrow = _segment_subbox(s)
                sub = table_ng.at[gr.reshape(-1)].get(
                    mode="promise_in_bounds")
                # f32 row indices: custom-vjp inputs need float
                # cotangents (rows < 2^24, exact in f32)
                gr_f = gr.astype(jnp.float32)
                s_arr = jnp.reshape(s, (1, 1)).astype(jnp.float32)
                return seg_op(s_arr, rays_packet, sub, lrow, gr_f,
                              table, carry, weights, tf_pad), None
        elif compact_slots:
            # the gather itself is not differentiated: the custom-VJP op
            # takes the table as an explicit input and hands back the
            # compacted scatter as its cotangent
            table_ng = jax.lax.stop_gradient(table)

            def body(carry, s):
                row = _segment_rows(s)
                lat = table_ng.at[row.reshape(-1)].get(
                    mode="promise_in_bounds")
                # 3D (n_tiles, 1, N): last-2 block dims must equal the
                # array dims for non-(8,128)-divisible blocks
                rows_f = row.reshape(n_tiles, 1, n_samples).astype(
                    jnp.float32)
                s_arr = jnp.reshape(s, (1, 1)).astype(jnp.float32)
                return seg_op(s_arr, rays_packet, lat, rows_f, table,
                              carry, weights, tf_pad), None
        else:
            def body(carry, s):
                lat = _segment_latent(s)
                s_arr = jnp.reshape(s, (1, 1)).astype(jnp.float32)
                return seg_op(s_arr, rays_packet, lat, carry, weights,
                              tf_pad), None
        # default: NO jax.checkpoint on the segment scan -- the
        # custom-vjp residuals are small (the gathered sub-box rows +
        # the (8, R) carry per segment, ~10 MB/seg at the flagship), so
        # letting the scan stack them is ~free in HBM while
        # rematerialization (segment_remat=True) re-runs the forward
        # pallas kernel once per segment in the backward -- measured at
        # ~40% of the whole backward pass (profile in PERF.md)
        body_fn = jax.checkpoint(body) if segment_remat else body
        carry, _ = jax.lax.scan(
            body_fn, carry0, jnp.arange(n_seg, dtype=jnp.int32))
    else:
        def cond(state):
            s, carry = state
            if boxfeat_t:
                k0r = jnp.repeat(k0t, tile)
                done_t = (k0r + s.astype(dtype) * seg) * stepsize \
                    > tmax[:, 0]
            else:
                done_t = tmin[:, 0] + s.astype(dtype) * seg * stepsize \
                    > tmax[:, 0]
            if enable_early_out:
                alive = ~(done_t | (carry[3, :] >= alpha_early_out))
            else:
                alive = ~done_t
            return (s < n_seg) & jnp.any(alive)

        def body(state):
            s, carry = state
            return s + 1, run_segment(s, carry)

        _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))

    if need_normals:
        from ..raytracer.dvr import RayEvaluationOutput
        return RayEvaluationOutput(color=carry[:4].T,
                                   normal=carry[5:8].T,
                                   depth=carry[8:9].T)
    return carry[:4].T
