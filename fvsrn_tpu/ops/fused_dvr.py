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

Supported configuration (v1): density-output SRNs (sigmoid or
clamp/direct), piecewise-linear TF, alpha/Beer-Lambert blending, optional
static latent grid, no direction input, no normals (shading-free DVR --
the reference's fast path too). Everything else falls back to the plain
JAX path in fvsrn_tpu.raytracer.dvr.
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

from ..models.latent import grid_sample_3d
from ..models.srn import SceneRepresentationNetwork
from ..utils.vecmath import intersect_aabb


class FusedWeights(NamedTuple):
    """Transposed-layout weights: every matrix maps column-samples,
    h_out = W @ h_in. First layer pre-split by input block."""
    fourier: Array          # (F, 3): f = fourier @ x
    w1_pos: Array           # (H, 3)
    w1_cos: Array           # (H, F)
    w1_sin: Array           # (H, F)
    w1_lat: Optional[Array]  # (H, CL) or None
    b1: Array               # (H, 1)
    hidden_w: tuple         # tuple of (H, H)
    hidden_b: tuple         # tuple of (H, 1)
    w_out: Array            # (1, H)
    b_out: Array            # (1, 1)


def extract_weights(net: SceneRepresentationNetwork,
                    dtype=jnp.float32) -> FusedWeights:
    """Split the SRN's first layer by input block (pos/cos/sin/latent),
    the fused-kernel analogue of the reference's weight export
    (reference: network.py:798-897 export_to_pyrenderer). Torch Linear
    weights are already (out, in), which IS the transposed layout."""
    assert not net.input.has_direction, "fused v1: no direction input"
    assert net.input.fourier_matrix_time is None, "fused v1: no time fourier"
    assert net.output_mode in ("density", "density:direct"), \
        "fused v1: density networks only"
    B = jnp.asarray(net.input.fourier_matrix, dtype)  # (F, 3)
    f = B.shape[0]
    cl = net.latent.total_channels
    w1 = jnp.asarray(net.layers[0].weight, dtype)  # (H, Cin)
    b1 = jnp.asarray(net.layers[0].bias, dtype)[:, None]
    w1_pos = w1[:, 0:3]
    w1_cos = w1[:, 3:3 + f]
    w1_sin = w1[:, 3 + f:3 + 2 * f]
    w1_lat = w1[:, 3 + 2 * f:] if cl > 0 else None
    hidden_w = tuple(jnp.asarray(l.weight, dtype)
                     for l in net.layers[1:-1])
    hidden_b = tuple(jnp.asarray(l.bias, dtype)[:, None]
                     for l in net.layers[1:-1])
    w_out = jnp.asarray(net.layers[-1].weight, dtype)   # (1, H)
    b_out = jnp.asarray(net.layers[-1].bias, dtype)[:, None]
    return FusedWeights(B, w1_pos, w1_cos, w1_sin, w1_lat, b1,
                        hidden_w, hidden_b, w_out, b_out)


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
# 512^2). The fourier features and pre-activations here are bounded
# (|x| < ~1e3), so a 2-term Cody-Waite reduction mod pi plus odd/even Taylor
# polynomials (degree 11/12, max error ~4e-7 on the reduced range) is exact
# enough for the fused-vs-plain 1e-4 contract at a fraction of the cost. The
# reference makes the same trade on the SFU (__sinf/__cosf half2 paths,
# renderer_activations.cuh).
_PI_HI = 3.140625                 # exact in f32 (12 mantissa bits)
_PI_MID = 0.0009676535846665502   # f32(pi - _PI_HI)
_INV_PI = 0.3183098861837907


def _fast_sincos(x: Array):
    """(sin x, cos x) via shared range reduction; f32 in, f32 out."""
    q = jnp.floor(x * _INV_PI + 0.5)
    r = x - q * _PI_HI
    r = r - q * _PI_MID            # r in [-pi/2, pi/2]
    sign = 1.0 - 2.0 * (q - 2.0 * jnp.floor(q * 0.5))  # (-1)^q
    r2 = r * r
    sp = r * (1.0 + r2 * (-1.0 / 6 + r2 * (1.0 / 120 + r2 * (
        -1.0 / 5040 + r2 * (1.0 / 362880 + r2 * (-1.0 / 39916800))))))
    cp = 1.0 + r2 * (-0.5 + r2 * (1.0 / 24 + r2 * (-1.0 / 720 + r2 * (
        1.0 / 40320 + r2 * (-1.0 / 3628800 + r2 * (1.0 / 479001600))))))
    return sign * sp, sign * cp


def _fast_sin(x: Array) -> Array:
    return _fast_sincos(x)[0]


def _fast_cos(x: Array) -> Array:
    return _fast_sincos(x)[1]


def build_window_table(grid: Array) -> Array:
    """Precompute the 3x3x3 window table for per-window gathers.

    Round-2 groundwork for halving the latent gather traffic (PERF.md
    decomposition: the per-sample (N, 128) row gather is ~75% of the
    training step): a K-step ray window with at most one cell crossing
    per axis touches at most the 27 corners around the window's minimum
    base, so ONE (512-lane) window row can serve all K samples, each
    sample selecting its 2x2x2 sub-cube in-kernel by masked static
    shuffles (:func:`select_subcube`).

    grid: (C, D, H, W), C <= 16. Returns (Vb, 512) with Vb =
    (D+1)(H+1)(W+1); row for window base wb holds blocks
    j = dz*9 + dy*3 + dx for dz,dy,dx in {0,1,2}, 16 channels each
    (lanes 432:512 zero). Same edge-clamp semantics as
    :func:`build_neighborhood_table`.
    """
    grid = jnp.asarray(grid, jnp.float32)
    c, d, h, w = grid.shape
    assert c <= 16, "window table supports <= 16 latent channels"
    if c < 16:
        grid = jnp.concatenate(
            [grid, jnp.zeros((16 - c, d, h, w), grid.dtype)], axis=0)
    p = jnp.pad(grid, ((0, 0), (1, 2), (1, 2), (1, 2)), mode="edge")
    blocks = []
    for dz in (0, 1, 2):
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                blocks.append(p[:, dz:dz + d + 1, dy:dy + h + 1,
                               dx:dx + w + 1])
    t = jnp.stack(blocks, axis=0)   # (27, 16, D+1, H+1, W+1)
    t = t.transpose(2, 3, 4, 0, 1)  # (D+1, H+1, W+1, 27, 16)
    t = t.reshape((d + 1) * (h + 1) * (w + 1), 27 * 16)
    return jnp.concatenate(
        [t, jnp.zeros((t.shape[0], 512 - 27 * 16), t.dtype)], axis=1)


def _subcube_lane_indices(o: tuple) -> np.ndarray:
    """Static lanes of the 2x2x2 sub-cube at offset o within a 512-lane
    window row (blocks of 16 channels, window block j = dz*9+dy*3+dx)."""
    oz, oy, ox = o
    lanes = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                j = (oz + dz) * 9 + (oy + dy) * 3 + (ox + dx)
                lanes.extend(range(j * 16, j * 16 + 16))
    return np.asarray(lanes, np.int32)


def select_subcube(window_rows: Array, offsets: Array) -> Array:
    """(N, 512) window rows + (N, 3) per-sample offsets in {0,1}^3
    (z, y, x order) -> (N, 128) 8-corner rows, layout-compatible with
    :func:`build_neighborhood_table` gathers. Offsets outside {0,1}
    (window constraint violated) select nothing and yield zero rows."""
    out = jnp.zeros((window_rows.shape[0], 128), window_rows.dtype)
    for oz in (0, 1):
        for oy in (0, 1):
            for ox in (0, 1):
                lanes = _subcube_lane_indices((oz, oy, ox))
                sub = window_rows[:, lanes]
                m = ((offsets[:, 0] == oz) & (offsets[:, 1] == oy)
                     & (offsets[:, 2] == ox))
                out = jnp.where(m[:, None], sub, out)
    return out


def _apply_act(name: str, x: Array, p: float) -> Array:
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


def _mlp_density_T(x, lat, fourier, w1pos, w1cos, w1sin, w1lat, b1,
                   hw, hb, w_out, b_out,
                   *, activation, act_param, output_direct, compute_dtype):
    """Transposed MLP: x (3, N), lat (CL, N) -> density (1, N)."""
    cd = compute_dtype

    def mm(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=jnp.float32)

    f = mm(fourier, x)                       # (F, N)
    sinf, cosf = _fast_sincos(f.astype(jnp.float32))
    h = mm(w1pos, x)
    h += mm(w1cos, cosf.astype(cd))
    h += mm(w1sin, sinf.astype(cd))
    if lat is not None:
        h += mm(w1lat, lat)
    h += b1.astype(jnp.float32)
    # activations in the compute dtype: bf16 packs 2 lanes/transcendental
    # (the reference evaluates them in fp16 on the SFU too,
    # renderer_activations.cuh half2 paths)
    h = _apply_act(activation, h.astype(cd), act_param)
    for k in range(len(hw)):
        h = mm(hw[k], h) + hb[k].astype(jnp.float32)
        h = _apply_act(activation, h.astype(cd), act_param)
    y = mm(w_out, h) + b_out.astype(jnp.float32)  # (1, N)
    if output_direct:
        return jnp.clip(y, 0.0, 1.0)
    return jax.nn.sigmoid(y)


def _segment_kernel(s_ref, rays_ref, lat_ref, carry_ref,
                    fourier_ref, w1pos_ref, w1cos_ref, w1sin_ref,
                    w1lat_ref, b1_ref, *rest_refs,
                    n_hidden: int, activation: str, act_param: float,
                    output_direct: bool, has_latent: bool,
                    latent_table: bool, grid_sizes: tuple, tf_points: int,
                    blend_beer: bool, seg: int, tile: int,
                    density_min: float, density_max: float,
                    stepsize: float, early_alpha: float,
                    box_min: tuple, box_size: tuple,
                    compute_dtype):
    """One (ray-tile, segment) program in transposed layout.

    s (1, 1) scalar segment index (SMEM); rays (8, tile) packet
    [start*3, dir*3, tmin, tmax]; lat rows (N, 128) or features
    (1, CL, N); carry (8, tile); N = seg*tile, column = j*tile + ray.
    Positions are rebuilt in-kernel from the ray packet -- streaming them
    from HBM plus the XLA-side transposes cost 26 ms/segment (measured),
    ~10x the useful work.
    """
    hw = rest_refs[:n_hidden]
    hb = rest_refs[n_hidden:2 * n_hidden]
    wout_ref = rest_refs[2 * n_hidden]
    bout_ref = rest_refs[2 * n_hidden + 1]
    tf_ref = rest_refs[2 * n_hidden + 2]
    out_ref = rest_refs[2 * n_hidden + 3]

    s = s_ref[0, 0].astype(jnp.float32)
    rays = rays_ref[:]                         # (8, tile)
    tmin = rays[6:7, :]                        # (1, tile)
    tmax = rays[7:8, :]
    # t per step, tiled over the segment: (1, N), N-major = j*tile + ray
    tval = jnp.concatenate(
        [tmin + (jnp.float32((jj)) + s * seg) * stepsize
         for jj in range(seg)], axis=1)        # (1, N)
    # world positions -> [0,1]^3 volume coords, channel-by-channel
    xs = []
    for c in range(3):
        sc = jnp.concatenate([rays[c:c + 1, :]] * seg, axis=1)
        dc = jnp.concatenate([rays[3 + c:4 + c, :]] * seg, axis=1)
        xs.append((sc + tval * dc - box_min[c]) / box_size[c])
    x = jnp.concatenate(xs, axis=0)            # (3, N)
    if not has_latent:
        lat = None
    elif latent_table:
        # in-kernel trilerp over the neighborhood rows (N, 128): compute
        # the 8 corner weights from the position fractions and fold them
        # into a (128, N) mask; the channel sum is absorbed into the
        # (H, 128) first-layer latent block (see fused_trace_dvr)
        n = x.shape[1]
        vx = x[0:1] * float(grid_sizes[0]) - 0.5
        vy = x[1:2] * float(grid_sizes[1]) - 0.5
        vz = x[2:3] * float(grid_sizes[2]) - 0.5
        fx = vx - jnp.floor(vx)                 # (1, N)
        fy = vy - jnp.floor(vy)
        fz = vz - jnp.floor(vz)
        gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
        w8 = [gz * gy * gx, gz * gy * fx, gz * fy * gx, gz * fy * fx,
              fz * gy * gx, fz * gy * fx, fz * fy * gx, fz * fy * fx]
        wrep = jnp.concatenate(
            [jnp.broadcast_to(wk, (16, n)) for wk in w8], axis=0)
        lat = lat_ref[:].astype(jnp.float32).T * wrep   # (128, N)
    else:
        lat = lat_ref[0]
    value = _mlp_density_T(
        x, lat, fourier_ref[:], w1pos_ref[:], w1cos_ref[:], w1sin_ref[:],
        w1lat_ref[:] if has_latent else None, b1_ref[:],
        [w[:] for w in hw], [b[:] for b in hb], wout_ref[:], bout_ref[:],
        activation=activation, act_param=act_param,
        output_direct=output_direct, compute_dtype=compute_dtype)
    # value: (1, N)

    inv_range = 1.0 / (density_max - density_min)
    # dense (seg, tile) layout for the epilogue: the (1, N) row uses 1/8
    # of each vreg's sublanes; reshaped, TF + compositing run dense
    v2 = value.reshape(seg, tile)
    density2 = (v2 - density_min) * inv_range
    d_clip = jnp.clip(density2, 0.0, 1.0)

    # piecewise-linear TF, unrolled over control intervals
    # (reference: renderer_tf_piecewise.cuh:27-64); interval index
    # i = sum_k [knot_k <= d] over interior knots
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

    # compositing as an associative tree reduction over the step axis:
    # per-step element (C_j, A_j) with C_j = rgba_j * ca_j; composition
    # (C1,A1)o(C2,A2) = (C1+(1-A1)C2, A1+(1-A1)A2) reproduces sequential
    # front-to-back blending exactly (alpha "over" is associative).
    # In-segment alpha-early-out is dropped (segment-level voting only);
    # the skipped tail is weighted by (1-alpha) <= 1-early_alpha.
    carry = carry_ref[:]                       # (8, tile)
    tval2 = tval.reshape(seg, tile)
    tmax_b = tmax                              # (1, tile) broadcasts
    valid = tval2 <= tmax_b
    require = valid & (v2 >= density_min)
    absn = jnp.where(require, absorption, 0.0)
    if blend_beer:
        ca = 1.0 - jnp.exp(-absn)
    else:
        ca = jnp.minimum(1.0, absn)
    prem = [jnp.where(require, rgba[c], 0.0) * ca for c in range(3)]

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

    seg_c, seg_a = reduce_range(0, seg)        # (1, tile) each
    alpha = carry[3:4, :]
    w0 = 1.0 - alpha
    rgb_r = carry[0:1, :] + w0 * seg_c[0]
    rgb_g = carry[1:2, :] + w0 * seg_c[1]
    rgb_b = carry[2:3, :] + w0 * seg_c[2]
    alpha = alpha + w0 * seg_a
    out_ref[0:1, :] = rgb_r
    out_ref[1:2, :] = rgb_g
    out_ref[2:3, :] = rgb_b
    out_ref[3:4, :] = alpha
    out_ref[4:5, :] = density2[seg - 1:seg, :]
    out_ref[5:8, :] = carry[5:8, :]


def _pad_tf(tf_tensor: Array) -> Array:
    """(R, 5) -> (R, 8) lane-pad for a clean VMEM layout."""
    t = jnp.asarray(tf_tensor, jnp.float32)
    r = t.shape[0]
    return jnp.concatenate([t, jnp.zeros((r, 3), t.dtype)], axis=1)


def _weight_list(w: FusedWeights, tf_pad: Array) -> list:
    out = [w.fourier, w.w1_pos, w.w1_cos, w.w1_sin]
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
                    seg: int = 32, tile: int = 256,
                    compute_dtype=jnp.float32,
                    differentiable: bool = False,
                    latent_mode: str = "table",
                    table_dtype=jnp.float32,
                    interpret: bool = False) -> Array:
    """Fused DVR through a density SRN. Returns rgba (R, 4).

    Semantics match ``trace_dvr`` over a ``VolumeInterpolationNetwork``
    with need_normals=False (verified allclose in tests/test_fused.py).
    ``differentiable=True`` uses a fixed-count segment scan (reverse-AD via
    per-segment rematerialization); the default runs a while_loop that
    stops once every ray saturated or left the box.

    The differentiable latent-grid gradient uses in-kernel run compaction
    when the per-segment voxel-crossing bound allows it; the bound assumes
    ``ray_dir`` is normalized (||d|| <= 1, as produced by generate_rays).
    Unnormalized directions may silently drop latent-gradient
    contributions on the compacted path.
    """
    r_total = ray_start.shape[0]
    if r_total % tile != 0:
        raise ValueError(f"ray count {r_total} must be a multiple of "
                         f"tile={tile} (pad the rays)")
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

    weights = extract_weights(net, jnp.float32)
    has_latent = weights.w1_lat is not None
    latent_grid = net.latent.static_grid if has_latent else None
    cl = weights.w1_lat.shape[1] if has_latent else 8
    use_table = has_latent and latent_mode == "table" and cl <= 16
    grid_sizes = (1, 1, 1)
    table = None
    if use_table:
        latent_grid = jnp.asarray(latent_grid, jnp.float32)
        _, gd, gh, gw = latent_grid.shape
        grid_sizes = (gw, gh, gd)  # (x, y, z) voxel counts
        table = build_neighborhood_table(latent_grid).astype(table_dtype)
        # first-layer latent block tiled over the 8 corner slots,
        # channels zero-padded to 16: (H, 128)
        w1l = weights.w1_lat
        if cl < 16:
            w1l = jnp.concatenate(
                [w1l, jnp.zeros((w1l.shape[0], 16 - cl), w1l.dtype)],
                axis=1)
        weights = weights._replace(w1_lat=jnp.tile(w1l, (1, 8)))

    n_seg = (max_steps + seg - 1) // seg
    n_tiles = r_total // tile
    n_samples = seg * tile
    tf_pad = _pad_tf(tf_tensor)
    tf_points = tf_tensor.shape[0]

    n_hidden = len(weights.hidden_w)
    static_kwargs = dict(
        activation=net.layers[0].activation,
        act_param=net.layers[0].activation_param,
        output_direct=(net.output_mode == "density:direct"),
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
    )
    kernel = functools.partial(_segment_kernel, n_hidden=n_hidden,
                               **static_kwargs)

    wlist = _weight_list(weights, tf_pad)
    in_specs = [
        # segment index scalar
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        # rays packet (8, R)
        pl.BlockSpec((8, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        # latent: table rows (n_tiles*seg*tile, 128) or trilerped
        # features (n_tiles, CL, seg*tile)
        (pl.BlockSpec((n_samples, 128), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) if use_table else
         pl.BlockSpec((1, cl, n_samples), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)),
        # carry (8, R)
        pl.BlockSpec((8, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, (lambda i, n=w.ndim: (0,) * n),
                     memory_space=pltpu.VMEM)
        for w in wlist
    ]
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, r_total), dtype),
        interpret=interpret,
    )

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
        lat = _segment_latent(s)
        s_arr = jnp.reshape(s, (1, 1)).astype(jnp.float32)
        return call(s_arr, rays_packet, lat, carry, *wlist)

    carry0 = jnp.zeros((8, r_total), dtype)
    carry0 = carry0.at[4, :].set(-1.0)  # prev-density sentinel

    if differentiable:
        from .fused_dvr_bwd import make_segment_op
        lat_shape = ((n_tiles * n_samples, 128) if use_table
                     else (n_tiles, cl, n_samples))
        lat_dtype = table_dtype if use_table else dtype

        # In-kernel run compaction of the latent-grid gradient scatter:
        # consecutive march steps share a base voxel, and for a
        # NORMALIZED direction the distinct-voxel count per ray per
        # segment is <= 4 + floor(||K||_2) with
        # K_i = seg*stepsize*res_i/box_i (per-axis crossings + phase).
        # The backward kernel then reduces seg per-step rows to `slots`
        # slot rows, shrinking the XLA scatter (measured: the scatter,
        # not the sort order, dominates the backward -- see PERF.md).
        compact_slots = 0
        if use_table:
            k_vec = [seg * float(stepsize) * grid_sizes[i] / bsize_t[i]
                     for i in range(3)]
            runs_max = 4 + int(np.floor(np.sqrt(sum(k * k
                                                    for k in k_vec))))
            slots = ((runs_max + 7) // 8) * 8
            if slots * 2 <= seg:
                compact_slots = slots

        seg_op = make_segment_op(
            kernel_fwd=kernel, grid_spec_fwd=grid_spec,
            r_total=r_total, n_tiles=n_tiles, n_samples=n_samples,
            seg=seg, tile=tile, cl=cl, use_table=use_table,
            has_latent=has_latent, n_hidden=n_hidden,
            kernel_kwargs=static_kwargs, lat_shape=lat_shape,
            lat_dtype=lat_dtype, interpret=interpret,
            compact_slots=compact_slots,
            table_shape=(None if table is None else table.shape),
            table_dtype=table_dtype)

        if compact_slots:
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
        carry, _ = jax.lax.scan(
            jax.checkpoint(body), carry0,
            jnp.arange(n_seg, dtype=jnp.int32))
    else:
        def cond(state):
            s, carry = state
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

    return carry[:4].T
