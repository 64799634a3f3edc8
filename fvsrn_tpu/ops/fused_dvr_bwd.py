"""Hand-written backward (adjoint) kernel for the fused SRN DVR segment.

The TPU analogue of the reference's in-kernel wmma adjoint
(reference: renderer/renderer_volume_tensorcores.cuh:1202-1450 transposed-
weight backward; renderer/renderer_adjoint.cuh; and the inverse-blending
trick of applications/volnet/raytracing.py:168-207,552-619):

- the forward is REPLAYED inside the backward kernel (per-segment
  rematerialization, the O(1)-in-steps memory strategy of the reference's
  checkpointed trace), storing per-step pre-blend accumulators as unrolled
  SSA values;
- compositing adjoint runs the unrolled step loop in reverse;
- the TF adjoint accumulates control-point gradients with in-kernel
  reductions (the reference's delayed shared-memory accumulation,
  renderer_tf_identity.cuh adjointAccumulate pattern);
- MLP adjoint: transposed-weight matmuls on the MXU, weight gradients
  contracted over the sample axis, accumulated across ray-tile programs
  through revisited output blocks (TPU pallas grids execute sequentially).

Ray-origin/direction (camera) gradients: ``want_ray_grads`` makes
:func:`bwd_segment_core` emit the per-sample position cotangent
(MLP-input chain); the megakernel adds the boxfeat trilerp-weight term
and folds steps into d_ray_start/d_ray_dir (the reference's
differentiable batched camera, camera.h:15-225) -- see
``mega_trace_dvr(ray_grads=True)``, oracle-tested in
tests/test_fused.py. The per-segment scan engine still routes camera
optimization through the plain path. Latent-grid gradients flow through
the ``d_rows -> scatter-add -> table -> grid`` chain in XLA.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# perf-ablation seams (tools/ablate_bwd_core.py): names in _ABLATE gut
# the matching section of bwd_segment_core for timing-only builds
_ABLATE = frozenset()

from . import fused_dvr as _fd
from .fused_dvr import (FusedWeights, _act_value_deriv, _fast_sin,
                        _fast_sincos, _fourier_sincos_rot,
                        _latent_features,
                        _weight_list as weights_list)


def _segment_bwd_kernel(s_ref, rays_ref, lat_ref, *refs,
                        n_hidden: int, activation: str, act_param: float,
                        output_mode: str, has_latent: bool,
                        latent_table: bool, grid_sizes: tuple,
                        tf_points: int, blend_beer: bool,
                        seg: int, tile: int,
                        density_min: float, density_max: float,
                        stepsize: float, early_alpha: float,
                        box_min: tuple, box_size: tuple,
                        compute_dtype, compact_slots: int = 0,
                        latent_subbox: tuple = (),
                        latent_boxfeat: tuple = (),
                        has_direction: bool = False,
                        need_normals: bool = False,
                        brdf: tuple = (),
                        want_stash: bool = False,
                        iso_value=None,
                        tf_mode: str = "piecewise",
                        tf_pre_rows: int = 0):
    """Backward of one (ray-tile, segment) program.

    Inputs mirror the forward kernel plus ``dcarry`` (8, tile), the
    cotangent of the output carry (and, with ``compact_slots``, the
    per-sample table rows (1, N) f32; with ``latent_subbox``, the
    per-sample local sub-box rows (1, 1, N) f32). Outputs (after the
    weight refs): d_lat (d_slot + slot_rows when compacting; d_sub
    (SZ3P, 128) in sub-box mode), d_carry_in, d_fourier, d_w1pos,
    d_w1cos, d_w1sin, d_w1lat, d_b1, d_hidden_w..., d_hidden_b...,
    d_wout, d_bout, d_tf. Weight/TF gradients accumulate across grid
    programs.
    """
    lrow_ref = None
    base_ref = None
    if latent_subbox:
        lrow_ref = refs[0]
        refs = refs[1:]
    elif latent_boxfeat:
        base_ref = refs[0]                 # SMEM (1, 1, 4) f32 scalars
        refs = refs[1:]
    if compact_slots:
        rows_ref = refs[0]
        refs = refs[1:]
    else:
        rows_ref = None
    stash_ref = None
    if want_stash:
        stash_ref = refs[0]
        refs = refs[1:]
    assert not need_normals and not brdf and iso_value is None \
        and tf_mode in ("piecewise", "texture", "gaussian",
                        "preint1d", "preint2d"), \
        "differentiable fused path: piecewise/texture/gaussian/" \
        "preint1d/preint2d TF, no normals/shading/iso"
    carry_ref, dcarry_ref = refs[0], refs[1]
    (fourier_ref, fdir_ref, w1pos_ref, w1dir_ref, w1cos_ref, w1sin_ref,
     w1lat_ref, b1_ref) = refs[2:10]
    rest_refs = refs[10:]
    hw = rest_refs[:n_hidden]
    hb = rest_refs[n_hidden:2 * n_hidden]
    wout_ref = rest_refs[2 * n_hidden]
    bout_ref = rest_refs[2 * n_hidden + 1]
    tf_ref = rest_refs[2 * n_hidden + 2]
    outs = rest_refs[2 * n_hidden + 3:]
    if compact_slots:
        dslot_ref, rowsout_ref = outs[0], outs[1]
        dlat_ref = None
        outs = outs[2:]
    else:
        dslot_ref = rowsout_ref = None
        dlat_ref = outs[0]
        outs = outs[1:]
    (dcarry_in_ref, dfourier_ref, dfdir_ref, dw1pos_ref, dw1dir_ref,
     dw1cos_ref, dw1sin_ref, dw1lat_ref, db1_ref) = outs[:9]
    dhw = outs[9:9 + n_hidden]
    dhb = outs[9 + n_hidden:9 + 2 * n_hidden]
    dwout_ref = outs[9 + 2 * n_hidden]
    dbout_ref = outs[9 + 2 * n_hidden + 1]
    dtf_ref = outs[9 + 2 * n_hidden + 2]

    cd = compute_dtype
    f32 = jnp.float32

    # ---------------- forward replay ----------------
    s = s_ref[0, 0].astype(f32)
    rays = rays_ref[:]
    tmin = rays[6:7, :]                        # k0_ray in boxfeat mode
    tmax = rays[7:8, :]
    if latent_boxfeat:
        # lattice-aligned replay (must mirror the forward kernel)
        k0 = base_ref[0, 0, 3]
        kk = jnp.concatenate(
            [tmin * 0.0 + (k0 + s * seg + jnp.float32(jj))
             for jj in range(seg)], axis=1)
        tval = kk * stepsize
    else:
        kk = None
        tval = jnp.concatenate(
            [tmin + (jnp.float32(jj) + s * seg) * stepsize
             for jj in range(seg)], axis=1)
    xs = []
    ds = []
    for c in range(3):
        sc = jnp.concatenate([rays[c:c + 1, :]] * seg, axis=1)
        dc = jnp.concatenate([rays[3 + c:4 + c, :]] * seg, axis=1)
        ds.append(dc)
        xs.append((sc + tval * dc - box_min[c]) / box_size[c])
    x = jnp.concatenate(xs, axis=0)            # (3, N)
    dirs = jnp.concatenate(ds, axis=0) if has_direction else None

    lat, wrep, oh, bf_aux = _latent_features(
        x, lat_ref, lrow_ref, has_latent=has_latent,
        latent_table=latent_table, latent_subbox=latent_subbox,
        grid_sizes=grid_sizes, compute_dtype=compute_dtype,
        latent_boxfeat=latent_boxfeat, base_ref=base_ref)

    weight_refs = (fourier_ref, fdir_ref, w1pos_ref, w1dir_ref, w1cos_ref,
                   w1sin_ref, w1lat_ref, b1_ref, tuple(hw), tuple(hb),
                   wout_ref, bout_ref, tf_ref)
    grad_refs = (dfourier_ref, dfdir_ref, dw1pos_ref, dw1dir_ref,
                 dw1cos_ref, dw1sin_ref, dw1lat_ref, db1_ref, tuple(dhw),
                 tuple(dhb), dwout_ref, dbout_ref, dtf_ref)
    d_lat, dcarry_rows, _ = bwd_segment_core(
        x=x, dirs=dirs, lat=lat, carry=carry_ref[:], dcarry=dcarry_ref[:],
        tval=tval, kk=kk, tmin=tmin, tmax=tmax,
        weight_refs=weight_refs, grad_refs=grad_refs,
        first=pl.program_id(0) == 0,
        stash=(stash_ref[:] if want_stash else None),
        n_hidden=n_hidden, activation=activation, act_param=act_param,
        output_mode=output_mode, has_latent=has_latent,
        tf_points=tf_points, blend_beer=blend_beer, seg=seg, tile=tile,
        density_min=density_min, density_max=density_max,
        stepsize=stepsize, early_alpha=early_alpha,
        compute_dtype=compute_dtype, has_direction=has_direction,
        latent_boxfeat=bool(latent_boxfeat), tf_mode=tf_mode,
        tf_pre_rows=tf_pre_rows)
    dcarry_in_ref[:] = dcarry_rows
    _emit_dlat(d_lat, wrep, oh, bf_aux, rows_ref,
               dlat_ref=dlat_ref, dslot_ref=dslot_ref,
               rowsout_ref=rowsout_ref, has_latent=has_latent,
               latent_table=latent_table, latent_subbox=latent_subbox,
               latent_boxfeat=latent_boxfeat, compact_slots=compact_slots,
               seg=seg, tile=tile)


def bwd_segment_core(*, x, dirs, lat, carry, dcarry, tval, kk, tmin, tmax,
                     weight_refs, grad_refs, first, stash,
                     n_hidden, activation, act_param, output_mode,
                     has_latent, tf_points, blend_beer, seg, tile,
                     density_min, density_max, stepsize, early_alpha,
                     compute_dtype, has_direction,
                     latent_boxfeat: bool, fourier_rot=None,
                     want_ray_grads: bool = False,
                     tf_mode: str = "piecewise",
                     tf_pre_rows: int = 0):
    """Layout-agnostic adjoint of one (ray-tile, segment): forward MLP
    replay, TF replay, blending replay, reverse compositing chain, TF
    control-point gradients, and transposed-weight MLP adjoint with
    weight gradients accumulated into ``grad_refs`` (zero-initialized
    under ``pl.when(first)``). Shared by the per-segment backward kernel
    and the megakernel backward (fused_mega).

    Returns ``(d_lat, dcarry_rows)``: the raw latent-feature cotangent
    (w1_lat^T @ dpre1, layout conversion is the caller's) and the (8,
    tile) incoming-carry cotangent rows.
    """
    (fourier_ref, fdir_ref, w1pos_ref, w1dir_ref, w1cos_ref, w1sin_ref,
     w1lat_ref, b1_ref, hw, hb, wout_ref, bout_ref, tf_ref) = weight_refs
    (dfourier_ref, dfdir_ref, dw1pos_ref, dw1dir_ref, dw1cos_ref,
     dw1sin_ref, dw1lat_ref, db1_ref, dhw, dhb, dwout_ref, dbout_ref,
     dtf_ref) = grad_refs
    want_stash = stash is not None
    cd = compute_dtype
    f32 = jnp.float32

    def mm(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=f32)

    def mm_ct(a, b):
        # contract the sample axis (axis 1 of both): (P, N)x(Q, N)->(P, Q)
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    if want_stash:
        # zero-transcendental replay: the forward stashed the fourier
        # sincos, post-activations, and activation derivatives (layout:
        # fused_dvr._stash_rows); only the cheap output head is redone
        st = stash
        fcount = fourier_ref.shape[0]
        f8 = -(-fcount // 8) * 8
        hcount = b1_ref.shape[0]
        sinf = st[0:fcount, :]
        cosf = st[f8:f8 + fcount, :]
        off = 2 * f8
        hs = []
        dacts = []
        for _k in range(n_hidden + 1):
            hs.append(st[off:off + hcount, :])
            off += hcount
        for _k in range(n_hidden + 1):
            dacts.append(st[off:off + hcount, :])
            off += hcount
        pres = None
    else:
        if fourier_rot is not None:
            # lattice phase rotation: trig per RAY, not per sample
            # (same scheme as the forward, fused_dvr._fourier_sincos_rot)
            seg_b, dxs = fourier_rot
            tile_n = x.shape[1] // seg_b
            f0 = mm(fourier_ref[:], x[:, :tile_n])
            if has_direction:
                f0 += mm(fdir_ref[:], dirs[:, :tile_n])
            df = mm(fourier_ref[:], dxs)
            sinf, cosf = _fourier_sincos_rot(f0, df, seg_b)
        else:
            fr = mm(fourier_ref[:], x)             # (F, N)
            if has_direction:
                fr += mm(fdir_ref[:], dirs)
            sinf, cosf = _fast_sincos(fr)
        # concatenated first-layer matmul (see _mlp_forward_T: K-pass
        # quantization makes one K<=128 matmul 4-5x cheaper)
        in_blocks = [x]
        w_blocks = [w1pos_ref[:]]
        if has_direction:
            in_blocks.append(dirs)
            w_blocks.append(w1dir_ref[:])
        in_blocks += [cosf, sinf]
        w_blocks += [w1cos_ref[:], w1sin_ref[:]]
        if lat is not None:
            in_blocks.append(lat)
            w_blocks.append(w1lat_ref[:])
        k_tot = sum(-(-b.shape[0] // 8) * 8 for b in in_blocks)
        if "l1mm" in _fd._ABLATE:            # timing-only fake
            pre1 = jnp.broadcast_to(b1_ref[:].astype(f32),
                                    (b1_ref.shape[0], x.shape[1])) * 1.0
            if "keepdeps" in _fd._ABLATE:    # see _mlp_forward_T
                pre1 = pre1 + 1e-30 * (x[0:1] + cosf[0:1] + sinf[0:1]
                                       + (lat[0:1] if lat is not None
                                          else 0.0))
        elif k_tot <= 128:
            pre1 = mm(_fd._wcat8(w_blocks),
                      _fd._incat8(in_blocks, compute_dtype))
        else:
            pre1 = mm(w_blocks[0], in_blocks[0])
            for wb, ib in zip(w_blocks[1:], in_blocks[1:]):
                pre1 += mm(wb, ib)
        pre1 += b1_ref[:].astype(f32)
        # value+derivative in ONE shared trig range reduction per layer
        # (the adjoint needs both; two separate _apply_act/_act_deriv
        # passes would pay the transcendental twice)
        h0, d0 = _act_value_deriv(activation, pre1, act_param)
        hs = [h0]
        dacts = [d0]
        for k in range(n_hidden):
            if "hidmm" in _fd._ABLATE:       # timing-only fake
                pre = hs[-1] * 1.01 + hb[k][:].astype(f32)
            else:
                pre = mm(hw[k][:], hs[-1]) + hb[k][:].astype(f32)
            hk, dk = _act_value_deriv(activation, pre, act_param)
            hs.append(hk)
            dacts.append(dk)
        pres = None
    rgbo_out = not output_mode.startswith("density")
    inv_range = 1.0 / (density_max - density_min)
    # Dense layout: with step-independent gating (differentiable mode
    # forces early_alpha=2.0 so `valid` never reads the running alpha)
    # ALL the TF/blend replay+adjoint math runs on sublane-packed
    # (seg, tile) arrays instead of single-sublane (1, N) rows + a
    # 2x`seg`-step sequential loop -- ~8x fewer vregs, and the alpha
    # chain and its adjoint become closed-form log-depth scans
    # (measured: the sequential form was ~40% of the whole backward).
    dense = early_alpha >= 1.5
    assert dense or (not rgbo_out and tf_mode == "piecewise"), \
        "fused backward: rgbo/texture modes require the dense path " \
        "(enable_early_out=False)"
    n_all = x.shape[1]
    # (4, 8) row selector: Mosaic cannot reshape sliced rows of a
    # (4, N)/(8, N) flat, so rows come out via one-hot matmuls (same
    # trick as the forward epilogue's rows4)
    eye48 = (jax.lax.broadcasted_iota(jnp.int32, (4, 8), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (4, 8), 1)
             ).astype(f32)
    knots = fracs = sels = None
    value2 = density2 = d_clip = None
    if rgbo_out:
        # 4-channel color head, TF skipped (reference: renderer_ray_
        # evaluation_stepping_dvr.cuh:105-111 SKIP_TRANSFER_FUNCTION;
        # output transforms network.py:171-237)
        y = mm(wout_ref[:], hs[-1]) + bout_ref[:].astype(f32)  # (4, N)
        out4, _ = _fd._apply_output_T(output_mode, y)
        rgba = [jnp.dot(eye48[c:c + 1, 0:out4.shape[0]], out4,
                        preferred_element_type=f32).reshape(seg, tile)
                for c in range(4)]
        absorption = rgba[3] * stepsize
    else:
        # M=1 head on the VPU (must replay the forward's exact math)
        y = jnp.sum(wout_ref[:].T.astype(f32) * hs[-1].astype(f32),
                    axis=0, keepdims=True) + bout_ref[:].astype(f32)
        if output_mode == "density:direct":
            value = jnp.clip(y, 0.0, 1.0)
        else:
            value = jax.nn.sigmoid(y)
        if dense:
            value2 = value.reshape(seg, tile)
        else:
            value2 = value
        density2 = (value2 - density_min) * inv_range
        d_clip = jnp.clip(density2, 0.0, 1.0)

        if tf_mode == "piecewise":
            knots = [tf_ref[k, 4] for k in range(tf_points)]
            interval = jnp.zeros_like(d_clip, dtype=jnp.int32)
            for k in range(1, tf_points - 1):
                interval += (knots[k] <= d_clip).astype(jnp.int32)
            rgba = [jnp.zeros_like(d_clip) for _ in range(4)]
            fracs = []
            sels = []
            for k in range(tf_points - 1):
                p0 = knots[k]
                p1 = knots[k + 1]
                frac = (jnp.clip(d_clip, p0, p1) - p0) / (p1 - p0)
                sel = interval == k
                fracs.append(frac)
                sels.append(sel)
                for c in range(4):
                    v = tf_ref[k, c] + frac * (tf_ref[k + 1, c]
                                               - tf_ref[k, c])
                    rgba[c] = jnp.where(sel, v, rgba[c])
            absorption = rgba[3] * stepsize
        elif tf_mode == "texture":
            # 1D TF texture replay (mirrors _march_epilogue's lut4
            # path; reference: renderer_tf_texture.cuh:41-56)
            d_clip_flat = d_clip.reshape(1, n_all)
            lut_flat = _fd._lut4(tf_ref[0:tf_points, :], d_clip_flat,
                                 tf_points, "texture")          # (8, N)
            rgba = [jnp.dot(eye48[c:c + 1], lut_flat,
                            preferred_element_type=f32
                            ).reshape(seg, tile) for c in range(4)]
            rgba[3] = rgba[3] * stepsize    # alpha column pre-scaled
            absorption = rgba[3]
        elif tf_mode == "preint1d":
            # 1D-preintegrated TF replay (mirrors _march_epilogue;
            # reference: renderer_tf_texture.cuh:62-84 + the cumulative
            # table of Compute1DPreintegrationTable)
            d_clip_flat = d_clip.reshape(1, n_all)
            plain8 = _fd._lut4(tf_ref[0:tf_points, :], d_clip_flat,
                               tf_points, "texture")            # (8, N)
            prev2 = jnp.concatenate(
                [carry[4:5, :], density2[:seg - 1, :]], axis=0)
            first2 = None
            if latent_boxfeat:
                first2 = kk.reshape(seg, tile) == tmin
                prev2 = jnp.where(first2, -1.0, prev2)
            prev_flat = prev2.reshape(1, n_all)
            sent = prev_flat < 0
            prev_eff = jnp.where(sent, d_clip_flat, prev_flat)
            pre_tbl = tf_ref[tf_points:tf_points + tf_pre_rows, :]
            vsf8 = _fd._lut4(pre_tbl, prev_eff, tf_pre_rows,
                             "cumulative")
            vsb8 = _fd._lut4(pre_tbl, d_clip_flat, tf_pre_rows,
                             "cumulative")
            denom = d_clip_flat - prev_eff
            near = jnp.abs(denom) < 1e-3
            safe = jnp.where(near, 1.0, denom)
            coef = stepsize / safe
            rgb_p = (vsb8[0:3, :] - vsf8[0:3, :]) * coef
            m_p = (vsb8[3:4, :] - vsf8[3:4, :]) * coef
            alpha_p = 1.0 - jnp.exp(-m_p)
            inv_a = jnp.where(alpha_p > 1e-5,
                              1.0 / jnp.maximum(alpha_p, 1e-5), 1.0)
            pre4 = jnp.concatenate([rgb_p * inv_a, alpha_p], axis=0)
            plain4 = jnp.concatenate(
                [plain8[0:3, :], plain8[3:4, :] * stepsize], axis=0)
            near4 = jnp.concatenate([near] * 4, axis=0)
            rgba_flat4 = jnp.where(near4, plain4, pre4)
            rgba = [jnp.dot(eye48[c:c + 1, 0:4], rgba_flat4,
                            preferred_element_type=f32
                            ).reshape(seg, tile) for c in range(4)]
            absorption = rgba[3]       # already an opacity
        elif tf_mode == "preint2d":
            # 2D-preintegration replay (mirrors _march_epilogue;
            # reference: renderer_tf_tex2D.cuh nearest (front, back)
            # cell)
            d_clip_flat = d_clip.reshape(1, n_all)
            prev2 = jnp.concatenate(
                [carry[4:5, :], density2[:seg - 1, :]], axis=0)
            first2 = None
            if latent_boxfeat:
                first2 = kk.reshape(seg, tile) == tmin
                prev2 = jnp.where(first2, -1.0, prev2)
            prev_flat = prev2.reshape(1, n_all)
            prev_eff = jnp.where(prev_flat < 0, d_clip_flat,
                                 jnp.clip(prev_flat, 0.0, 1.0))
            r2 = tf_pre_rows
            fr2 = jnp.float32(r2)
            i_f = jnp.minimum(jnp.floor(prev_eff * fr2), fr2 - 1.0)
            j_b = jnp.minimum(jnp.floor(d_clip_flat * fr2), fr2 - 1.0)
            iot2 = jax.lax.broadcasted_iota(
                jnp.int32, (r2, n_all), 0).astype(f32)
            fsel = (iot2 == i_f).astype(f32)
            bsel = (iot2 == j_b).astype(f32)
            ones_r2 = jnp.ones((1, r2), f32)
            tf_all2 = tf_ref[:].astype(f32)
            vals = []
            for c in range(4):
                a_c = tf_all2[c * r2:(c + 1) * r2, :]
                m_c = jax.lax.dot_general(
                    a_c, bsel, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                vals.append(jnp.dot(ones_r2, fsel * m_c,
                                    preferred_element_type=f32))
            w_a = vals[3]
            inv_a = jnp.where(w_a > 1e-5,
                              1.0 / jnp.maximum(w_a, 1e-5), 1.0)
            rgba_flat4 = jnp.concatenate(
                [vals[0] * inv_a, vals[1] * inv_a, vals[2] * inv_a,
                 w_a], axis=0)
            rgba = [jnp.dot(eye48[c:c + 1, 0:4], rgba_flat4,
                            preferred_element_type=f32
                            ).reshape(seg, tile) for c in range(4)]
            absorption = rgba[3]       # premultiplied opacity
        elif tf_mode == "gaussian":
            # sum-of-gaussians replay (mirrors _march_epilogue;
            # reference: renderer_tf_gaussian.cuh:36-88 plain mode)
            d_clip_flat = d_clip.reshape(1, n_all)
            tfg = tf_ref[:].astype(f32)                  # (G, 6)
            g_mu = tfg[:, 4:5]
            g_sg = tfg[:, 5:6]
            g_w = jnp.exp(-((d_clip_flat - g_mu) ** 2)
                          / (g_sg * g_sg))               # (G, N)
            rgba_flat = jax.lax.dot_general(
                tfg[:, 0:4], g_w, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)              # (4, N)
            rgba = [jnp.dot(eye48[c:c + 1, 0:4], rgba_flat,
                            preferred_element_type=f32
                            ).reshape(seg, tile) for c in range(4)]
            absorption = rgba[3] * stepsize
        else:
            raise NotImplementedError(
                f"fused backward: tf_mode {tf_mode!r}")

    d_rgb = [dcarry[0:1, :], dcarry[1:2, :], dcarry[2:3, :]]
    # d_prev (carry row 4) only matters for preintegrating TFs; the
    # piecewise TF ignores previous density -> cotangent stops here.
    if dense:
        # ---- dense (seg, tile) blend replay + adjoint ----
        tval2 = tval.reshape(seg, tile)
        valid = tval2 <= tmax                       # (1,tile) broadcast
        if latent_boxfeat:
            # lattice lower bound: no samples before the ray's k0
            valid = valid & (kk.reshape(seg, tile) >= tmin)
        if rgbo_out:
            require = valid        # color field: no density gate
        else:
            require = valid & (value2 >= density_min)
        absn = jnp.where(require, absorption, 0.0)  # (seg, tile)
        if blend_beer:
            ca = 1.0 - jnp.exp(-absn)
        else:
            ca = jnp.minimum(1.0, absn)
        contrib = require & (absn > 0)
        # alpha chain: 1-alpha_j = (1-alpha0) * prod_{i<j}(1-ca_i)
        # (exclusive prefix product, Hillis-Steele over the step axis)
        S = 1.0 - ca
        k = 1
        while k < seg:
            S = S * jnp.concatenate(
                [jnp.ones((k, tile), f32), S[:seg - k]], axis=0)
            k *= 2
        cumexcl = jnp.concatenate(
            [jnp.ones((1, tile), f32), S[:seg - 1]], axis=0)
        one_m_a0 = 1.0 - carry[3:4, :]
        trans_in = one_m_a0 * cumexcl               # 1 - alpha_in_j
        w = jnp.where(contrib, trans_in * ca, 0.0)
        # d_alpha recurrence (reverse step order) is affine:
        #   d_alpha_j = (1-e_j) d_alpha_{j+1} - e_j s_j,  e_j = gated ca
        # suffix-composed in log depth; d_rgb passes through unchanged.
        s_mix = (d_rgb[0] * rgba[0] + d_rgb[1] * rgba[1]
                 + d_rgb[2] * rgba[2])              # (seg, tile)
        if "blendadj" in _ABLATE:               # timing-only fake
            d_rgba = [w * d_rgb[c] for c in range(3)]
            d_rgba.append(s_mix * stepsize)
            dcarry_rows = jnp.concatenate(
                d_rgb + [dcarry[3:4, :] * 0.5,
                         jnp.zeros((4, tile), f32)], axis=0)
        else:
            e = jnp.where(contrib, ca, 0.0)
            P = 1.0 - e
            Q = -e * s_mix
            k = 1
            while k < seg:
                Pup = jnp.concatenate(
                    [P[k:], jnp.ones((k, tile), f32)], axis=0)
                Qup = jnp.concatenate(
                    [Q[k:], jnp.zeros((k, tile), f32)], axis=0)
                Q = P * Qup + Q
                P = P * Pup
                k *= 2
            d_alpha_in = dcarry[3:4, :]
            # cotangent wrt alpha AFTER step j = suffix over j+1..end
            Pa = jnp.concatenate([P[1:], jnp.ones((1, tile), f32)],
                                 axis=0)
            Qa = jnp.concatenate([Q[1:], jnp.zeros((1, tile), f32)],
                                 axis=0)
            d_alpha_after = Pa * d_alpha_in + Qa    # (seg, tile)
            dw = s_mix + d_alpha_after
            d_rgba = [w * d_rgb[c] for c in range(3)]
            d_ca = jnp.where(contrib, trans_in * dw, 0.0)
            if blend_beer:
                d_absn = d_ca * jnp.exp(-absn)
            else:
                d_absn = d_ca * (absn < 1.0)
            # cotangent wrt rgba[3]: piecewise/rgbo/gaussian scale by
            # stepsize in the blend (absorption = rgba[3]*h); the
            # texture/preint paths' rgba[3] IS the absorption already
            d_rgba.append(d_absn * (
                1.0 if tf_mode in ("texture", "preint1d", "preint2d")
                and not rgbo_out else stepsize))
            d_alpha0 = P[0:1, :] * d_alpha_in + Q[0:1, :]
            dcarry_rows = jnp.concatenate(
                d_rgb + [d_alpha0, jnp.zeros((4, tile), f32)], axis=0)
    else:
        # ---- sequential replay (alpha-dependent gating) ----
        alpha = carry[3:4, :]
        alphas_in = []
        requires = []
        cas = []
        ws = []
        absns = []
        for j in range(seg):
            sl = (slice(None), slice(j * tile, (j + 1) * tile))
            valid = (tval[sl] <= tmax) & (alpha < early_alpha)
            if latent_boxfeat:
                valid = valid & (kk[sl] >= tmin)
            require = valid & (value[sl] >= density_min)
            absn = jnp.where(require, absorption[sl], 0.0)
            if blend_beer:
                ca = 1.0 - jnp.exp(-absn)
            else:
                ca = jnp.minimum(1.0, absn)
            contrib = require & (absn > 0)
            w = jnp.where(contrib, (1.0 - alpha) * ca, 0.0)
            alphas_in.append(alpha)
            requires.append(contrib)
            cas.append(ca)
            ws.append(w)
            absns.append(absn)
            alpha = alpha + w

        d_alpha = dcarry[3:4, :]
        d_rgba_steps = [[None] * seg for _ in range(4)]
        for j in reversed(range(seg)):
            sl = (slice(None), slice(j * tile, (j + 1) * tile))
            contrib = requires[j]
            alpha_in = alphas_in[j]
            ca = cas[j]
            w = ws[j]
            dw = (d_rgb[0] * rgba[0][sl] + d_rgb[1] * rgba[1][sl]
                  + d_rgb[2] * rgba[2][sl] + d_alpha)
            for c in range(3):
                d_rgba_steps[c][j] = jnp.where(contrib, w * d_rgb[c], 0.0)
            d_ca = jnp.where(contrib, (1.0 - alpha_in) * dw, 0.0)
            d_alpha = d_alpha - jnp.where(contrib, ca * dw, 0.0)
            if blend_beer:
                d_absn = d_ca * jnp.exp(-absns[j])
            else:
                d_absn = d_ca * (absns[j] < 1.0)
            d_rgba_steps[3][j] = jnp.where(contrib, d_absn * stepsize,
                                           0.0)
            # d_rgb passes through unchanged (rgb = rgb_in + w*rgba)
        d_rgba = [jnp.concatenate(d_rgba_steps[c], axis=1)
                  for c in range(4)]
        dcarry_rows = jnp.concatenate(
            d_rgb + [d_alpha, jnp.zeros((4, tile), f32)], axis=0)

    # TF adjoint + head cotangent per mode
    if rgbo_out:
        # no TF: zero its gradient once, chain d_rgba -> d_y (4, N)
        # through the output transforms (network.py:171-237 adjoints)
        @pl.when(first)
        def _init_tf():
            for k in range(tf_ref.shape[0]):
                for c in range(8):
                    dtf_ref[k, c] = jnp.float32(0.0)

        dr_flat = [d_rgba[c].reshape(1, n_all) for c in range(3)]
        # d_rgba[3] is already the cotangent wrt the RAW opacity o (the
        # blend adjoint folded the absorption = o*stepsize chain)
        da_flat = d_rgba[3].reshape(1, n_all)
        y3 = jnp.dot(eye48[3:4, 0:4], y, preferred_element_type=f32)
        if output_mode == "rgbo":            # o = softplus(y3)
            do_dy = jax.nn.sigmoid(y3)
        elif output_mode == "rgbo:exp":      # o = exp(y3)
            do_dy = jnp.dot(eye48[3:4, 0:4], out4,
                            preferred_element_type=f32)
        else:                                # rgbo:direct: o = max(y3,0)
            do_dy = (y3 > 0).astype(f32)
        d_rgb_rows = []
        for c in range(3):
            yc = jnp.dot(eye48[c:c + 1, 0:4], y,
                         preferred_element_type=f32)
            if output_mode == "rgbo:direct":   # rgb = clip(y, 0, 1)
                d_rgb_rows.append(
                    dr_flat[c] * ((yc > 0) & (yc < 1)).astype(f32))
            else:                              # rgb = sigmoid(y)
                rc = jax.nn.sigmoid(yc)
                d_rgb_rows.append(dr_flat[c] * rc * (1.0 - rc))
        d_y = jnp.concatenate(d_rgb_rows + [da_flat * do_dy], axis=0)
    elif tf_mode == "texture":
        # LUT adjoint (reference: the 1D TF texture's trained-table
        # gradient): d_table via the transposed interpolation one-hot
        # (one MXU contraction into the 256-texel table -- the texture
        # analog of the piecewise control-point accumulation), and
        # d_density via the lerp slope (tbl[hi]-tbl[lo]) * dx/ds
        @pl.when(first)
        def _init_tf():
            dtf_ref[:] = jnp.zeros_like(dtf_ref)

        dflat8 = jnp.concatenate(
            [d_rgba[c].reshape(1, n_all) for c in range(3)]
            + [d_rgba[3].reshape(1, n_all) * stepsize,
               jnp.zeros((4, n_all), f32)], axis=0)            # (8, N)
        lo, hi, fq, dx_ds = _fd._lut4_weights(
            d_clip.reshape(1, n_all), tf_points, "texture")
        iot = jax.lax.broadcasted_iota(
            jnp.int32, (tf_points, n_all), 0).astype(f32)
        wlo = (iot == lo).astype(f32)
        whi = (iot == hi).astype(f32)
        if "tfadj" not in _ABLATE:
            wmat = wlo * (1.0 - fq) + whi * fq
            dtf_ref[:] += jax.lax.dot_general(
                wmat, dflat8, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                    # (R, 8)
        diff8 = jax.lax.dot_general(
            tf_ref[0:tf_points, :].astype(f32), whi - wlo,
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                        # (8, N)
        d_s = jnp.dot(jnp.ones((1, 8), f32), dflat8 * diff8,
                      preferred_element_type=f32) * dx_ds      # (1, N)
        d_dclip = d_s.reshape(d_clip.shape)
    elif tf_mode == "preint1d":
        # 1D-preintegration adjoint: both LUT chains (plain table at
        # d_clip for the near branch; cumulative table at prev_eff AND
        # d_clip for the preintegrated branch), the 1/(d - prev)
        # quotient, alpha = 1-exp(-m), the premultiplied-color inv_a,
        # and the PREVIOUS-DENSITY chain: row j's prev cotangent shifts
        # to density j-1, row 0's rides dcarry row 4 to the previous
        # segment program (segments run in reverse, so the chain
        # composes exactly like the forward's prev carry).
        @pl.when(first)
        def _init_tf():
            dtf_ref[:] = jnp.zeros_like(dtf_ref)   # VMEM array accum

        d4 = jnp.concatenate(
            [d_rgba[c].reshape(1, n_all) for c in range(4)], axis=0)
        near4f = near4.astype(f32)
        d4n = d4 * near4f
        d4p = d4 * (1.0 - near4f)
        rows_total = tf_ref.shape[0]
        iot_all = jax.lax.broadcasted_iota(
            jnp.int32, (rows_total, n_all), 0).astype(f32)

        def lut_adj(s_flat, r, convention, row_offset, dflat8):
            """Accumulate d_table into dtf_ref rows [row_offset,
            row_offset+r) and return d_s (gated cumulative slope)."""
            lo, hi, fq, dx_ds = _fd._lut4_weights(s_flat, r, convention)
            lo_g = lo + float(row_offset)
            hi_g = hi + float(row_offset)
            wlo = (iot_all == lo_g).astype(f32)
            whi = (iot_all == hi_g).astype(f32)
            if "tfadj" not in _ABLATE:
                wmat = wlo * (1.0 - fq) + whi * fq
                dtf_ref[:] += jax.lax.dot_general(
                    wmat, dflat8, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            diff8 = jax.lax.dot_general(
                tf_ref[:].astype(f32), whi - wlo,
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32)            # (8, N)
            d_s = jnp.dot(jnp.ones((1, 8), f32), dflat8 * diff8,
                          preferred_element_type=f32) * dx_ds
            if convention == "cumulative":
                # x = clip(s, 0, 1) * (r-1): zero slope outside [0, 1]
                d_s = jnp.where((s_flat > 0.0) & (s_flat < 1.0),
                                d_s, 0.0)
            return d_s

        def pad8r(a):
            return jnp.concatenate(
                [a, jnp.zeros((8 - a.shape[0], n_all), f32)], axis=0)

        # near branch: the plain texture fetch (alpha column scaled h)
        dplain8 = pad8r(jnp.concatenate(
            [d4n[0:3, :], d4n[3:4, :] * stepsize], axis=0))
        d_dclip_f = lut_adj(d_clip_flat, tf_points, "texture", 0,
                            dplain8)

        # preintegrated branch
        d_rgbp = d4p[0:3, :] * inv_a
        d_inv_a = jnp.dot(jnp.ones((1, 3), f32), d4p[0:3, :] * rgb_p,
                          preferred_element_type=f32)
        d_alpha_p = d4p[3:4, :] + d_inv_a * jnp.where(
            alpha_p > 1e-5,
            -1.0 / (jnp.maximum(alpha_p, 1e-5) ** 2), 0.0)
        d_m = d_alpha_p * jnp.exp(-m_p)
        dv8 = pad8r(jnp.concatenate([d_rgbp * coef, d_m * coef],
                                    axis=0))
        # d wrt safe (= denom off the near branch): rgb_p = dv*coef,
        # coef = h/safe -> d_safe = -(sum d_rgbp*rgb_p + d_m*m)/safe
        d_safe = -(jnp.dot(jnp.ones((1, 3), f32), d_rgbp * rgb_p,
                           preferred_element_type=f32)
                   + d_m * m_p) / safe
        d_denom = jnp.where(near, 0.0, d_safe)
        d_dclip_f += lut_adj(d_clip_flat, tf_pre_rows, "cumulative",
                             tf_points, dv8) + d_denom
        d_prev_eff = lut_adj(prev_eff, tf_pre_rows, "cumulative",
                             tf_points, -dv8) - d_denom
        # prev_eff = where(sent, d_clip, prev)
        d_dclip_f += jnp.where(sent, d_prev_eff, 0.0)
        d_prev_flat = jnp.where(sent, 0.0, d_prev_eff)
        d_prev2 = d_prev_flat.reshape(seg, tile)
        # shift: row j's prev = density j-1; row 0 -> carry row 4 of
        # the PREVIOUS segment; incoming dcarry row 4 = the NEXT
        # segment's prev cotangent -> this segment's last density
        d_density2_prev = jnp.concatenate(
            [d_prev2[1:, :], dcarry[4:5, :]], axis=0)
        d_prev_carry = d_prev2[0:1, :]
        dcarry_rows = jnp.concatenate(
            [dcarry_rows[0:4, :], d_prev_carry,
             jnp.zeros((3, tile), f32)], axis=0)
        d_dclip = d_dclip_f.reshape(seg, tile)
    elif tf_mode == "preint2d":
        # 2D-preintegration adjoint: per-channel plane gradients via
        # the (front, back) one-hot outer contraction. The nearest-cell
        # lookup is piecewise-constant in BOTH densities, so the
        # density/prev cotangents are zero almost everywhere -- exactly
        # what jax.grad of the plain oracle produces (floor/gather have
        # zero gradient); only the 2D table trains in this mode.
        @pl.when(first)
        def _init_tf():
            dtf_ref[:] = jnp.zeros_like(dtf_ref)   # VMEM array accum

        d4 = jnp.concatenate(
            [d_rgba[c].reshape(1, n_all) for c in range(4)], axis=0)
        d_inv_a = (jnp.dot(eye48[0:1, 0:4], d4,
                           preferred_element_type=f32) * vals[0]
                   + jnp.dot(eye48[1:2, 0:4], d4,
                             preferred_element_type=f32) * vals[1]
                   + jnp.dot(eye48[2:3, 0:4], d4,
                             preferred_element_type=f32) * vals[2])
        dv = [jnp.dot(eye48[c:c + 1, 0:4], d4,
                      preferred_element_type=f32) * inv_a
              for c in range(3)]
        dv.append(jnp.dot(eye48[3:4, 0:4], d4,
                          preferred_element_type=f32)
                  + d_inv_a * jnp.where(
                      w_a > 1e-5,
                      -1.0 / (jnp.maximum(w_a, 1e-5) ** 2), 0.0))
        if "tfadj" not in _ABLATE:
            for c in range(4):
                dtf_ref[c * r2:(c + 1) * r2, :] += jax.lax.dot_general(
                    fsel * dv[c], bsel, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
        d_dclip = jnp.zeros_like(d_clip)
    elif tf_mode == "gaussian":
        # sum-of-gaussians adjoint: analytic chains for colors/opacity
        # (one MXU contraction into the (G, 4) block), means, widths,
        # and the density (reference: the gaussian TF trains in
        # raytracing.py's backward like every other TF mode)
        @pl.when(first)
        def _init_tf():
            for k in range(tf_ref.shape[0]):
                for c in range(tf_ref.shape[1]):
                    dtf_ref[k, c] = jnp.float32(0.0)

        # d_rgba[3] is already the cotangent wrt the RAW gaussian
        # opacity (the blend adjoint folded absorption = rgba[3]*h)
        dflat4 = jnp.concatenate(
            [d_rgba[c].reshape(1, n_all) for c in range(4)],
            axis=0)                                      # (4, N)
        # d wrt the per-gaussian weight row: (G, N)
        d_gw = jax.lax.dot_general(
            tfg[:, 0:4], dflat4, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        u = (d_clip_flat - g_mu) / (g_sg * g_sg)         # (G, N)
        core = d_gw * g_w                                 # (G, N)
        n_g = tf_ref.shape[0]
        ones_g = jnp.ones((1, n_g), f32)
        d_dclip = jnp.dot(ones_g, core * (-2.0) * u,
                          preferred_element_type=f32
                          ).reshape(d_clip.shape)
        # per-gaussian scalar gradients (G is small -- scalar sums like
        # the piecewise control-point accumulation)
        d_mu_rows = 2.0 * core * u                       # (G, N)
        d_sg_rows = 2.0 * core * u * (d_clip_flat - g_mu) / g_sg
        for g in range(n_g):
            for c in range(4):
                dtf_ref[g, c] += jnp.sum(
                    g_w[g:g + 1, :] * dflat4[c:c + 1, :])
            dtf_ref[g, 4] += jnp.sum(d_mu_rows[g:g + 1, :])
            dtf_ref[g, 5] += jnp.sum(d_sg_rows[g:g + 1, :])
    else:
        # piecewise TF adjoint (reference: piecewise TF control points;
        # gradients for colors/opacity and knot positions,
        # interior-gated subgradients)
        @pl.when(first)
        def _init_tf():
            for k in range(tf_points):
                for c in range(8):
                    dtf_ref[k, c] = jnp.float32(0.0)

        d_dclip = jnp.zeros_like(d_clip)
        for k in (range(tf_points - 1) if "tfadj" not in _ABLATE
                  else ()):
            p0 = knots[k]
            p1 = knots[k + 1]
            sel = sels[k]
            frac = fracs[k]
            interior = sel & (d_clip > p0) & (d_clip < p1)
            d_frac = jnp.zeros_like(d_clip)
            for c in range(4):
                dc = jnp.where(sel, d_rgba[c], 0.0)
                dtf_ref[k, c] += jnp.sum(dc * (1.0 - frac))
                dtf_ref[k + 1, c] += jnp.sum(dc * frac)
                d_frac += dc * (tf_ref[k + 1, c] - tf_ref[k, c])
            inv_dp = 1.0 / (p1 - p0)
            d_dclip += jnp.where(interior, d_frac * inv_dp, 0.0)
            dtf_ref[k, 4] += jnp.sum(
                jnp.where(interior, d_frac * (frac - 1.0) * inv_dp, 0.0))
            dtf_ref[k + 1, 4] += jnp.sum(
                jnp.where(interior, -d_frac * frac * inv_dp, 0.0))

    if not rgbo_out:
        d_density2 = jnp.where((density2 > 0) & (density2 < 1),
                               d_dclip, 0.0)
        if tf_mode == "preint1d":
            # the prev-density chain consumes density2 UNCLIPPED
            d_density2 = d_density2 + d_density2_prev
        d_value = d_density2 * inv_range
        y2 = y.reshape(value2.shape)
        if output_mode == "density:direct":
            d_y = jnp.where((y2 > 0) & (y2 < 1), d_value, 0.0)
        else:
            d_y = d_value * value2 * (1.0 - value2)
        if dense:
            d_y = d_y.reshape(1, seg * tile)

    # MLP adjoint (transposed weights, contract over samples)
    @pl.when(first)
    def _init_w():
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw1pos_ref[:] = jnp.zeros_like(dw1pos_ref)
        dw1dir_ref[:] = jnp.zeros_like(dw1dir_ref)
        dw1cos_ref[:] = jnp.zeros_like(dw1cos_ref)
        dw1sin_ref[:] = jnp.zeros_like(dw1sin_ref)
        dw1lat_ref[:] = jnp.zeros_like(dw1lat_ref)
        dfourier_ref[:] = jnp.zeros_like(dfourier_ref)
        dfdir_ref[:] = jnp.zeros_like(dfdir_ref)
        for k in range(n_hidden):
            dhw[k][:] = jnp.zeros_like(dhw[k])
            dhb[k][:] = jnp.zeros_like(dhb[k])

    dbout_ref[:] += jnp.sum(d_y, axis=1, keepdims=True)
    h_dim = b1_ref.shape[0]
    cout = wout_ref.shape[0]
    if cout == 1:
        dh = wout_ref[:].T.astype(f32) * d_y      # K=1 outer product
    else:
        dh = mm(wout_ref[:].T, d_y)
    dpres = []
    for k in reversed(range(n_hidden)):
        dpre = dh * dacts[k + 1]
        dpres.insert(0, dpre)
        dhb[k][:] += jnp.sum(dpre, axis=1, keepdims=True)
        if "chainmm" in _fd._ABLATE:         # timing-only fake
            dh = dpre * 0.99
        else:
            dh = mm(hw[k][:].T, dpre)
    dpre1 = dh * dacts[0]
    db1_ref[:] += jnp.sum(dpre1, axis=1, keepdims=True)

    # Input-side cotangents: stack the transposed first-layer blocks
    # (8-aligned with zero rows) into one K=H matmul.
    fcount = cosf.shape[0]
    f8b = -(-fcount // 8) * 8
    # Mosaic cannot lower zero-size vectors: only pad when fcount is
    # not already 8-aligned (zero-row jnp.zeros((0, H)) fails to lower)
    zpad = ([jnp.zeros((f8b - fcount, h_dim), f32)]
            if f8b > fcount else [])
    big_t = [w1cos_ref[:].T.astype(f32)] + zpad \
        + [w1sin_ref[:].T.astype(f32)] + zpad
    if has_latent and lat is not None:
        big_t.append(w1lat_ref[:].T.astype(f32))
    if "chainmm" in _fd._ABLATE:             # timing-only fake
        reps = -(-sum(b.shape[0] for b in big_t) // dpre1.shape[0])
        dd = jnp.concatenate([dpre1 * 0.1] * reps,
                             axis=0)[:sum(b.shape[0] for b in big_t)]
    else:
        dd = mm(jnp.concatenate(big_t, axis=0), dpre1)
    d_cosf = dd[0:fcount, :]
    d_sinf = dd[f8b:f8b + fcount, :]
    d_f = -sinf * d_cosf + cosf * d_sinf
    d_lat = None
    if has_latent and lat is not None:
        d_lat = dd[2 * f8b:2 * f8b + lat.shape[0], :]  # (128|16|CL, N)

    # per-sample POSITION cotangent (normalized [0,1]^3 coords) for
    # camera/ray gradients (reference: the differentiable batched
    # camera, camera.h:15-225 Parameter<T> grads): the MLP-input chain
    # only -- the caller adds the latent trilerp-weight term (it owns
    # the BoxfeatAux) and folds steps into d_ray_start/d_ray_dir.
    # Masking is inherited: dpre1/d_f are zero on non-contributing
    # lanes through the gated d_y.
    d_x_mlp = None
    d_dirs_mlp = None
    if want_ray_grads:
        d_x_mlp = mm(w1pos_ref[:].T, dpre1) + mm(fourier_ref[:].T, d_f)
        if has_direction:
            d_dirs_mlp = mm(w1dir_ref[:].T, dpre1) \
                + mm(fdir_ref[:].T, d_f)

    # ALL weight gradients in two sample-axis mega-contractions: an
    # mm_ct costs the full N/128 K-passes on the MXU no matter how
    # narrow its output, so stacking every (cotangent x activation)
    # pair into one (rows, N)x(cols, N) contraction replaces ~7
    # contractions with 2 (the outputs are sliced back per block --
    # lane/sublane selects on small values). Position gradients
    # (fourier^T d_f + w1pos^T dpre1) are dropped: the camera is not
    # differentiated through the fused path (v1).
    def pad8(a):
        p = (-a.shape[0]) % 8
        if p:
            return jnp.concatenate(
                [a.astype(f32), jnp.zeros((p, a.shape[1]), f32)], axis=0)
        return a.astype(f32)

    cout8 = -(-cout // 8) * 8
    if "wgrad" in _ABLATE:                       # timing-only
        return d_lat, dcarry_rows, (d_x_mlp, d_dirs_mlp)
    # A: lhs [d_y | dpre_1.. | dpre1 | d_f], cols [hs_0.. hs_n | x+dirs]
    lhs_a = jnp.concatenate(
        [pad8(d_y)] + dpres + [dpre1, pad8(d_f)], axis=0)
    xdir = jnp.concatenate(
        [x] + ([dirs] if has_direction else []), axis=0)
    cols_a = jnp.concatenate([h.astype(f32) for h in hs] + [pad8(xdir)],
                             axis=0)
    ga = mm_ct(lhs_a, cols_a)
    xoff = (n_hidden + 1) * h_dim
    dwout_ref[:] += ga[0:cout, n_hidden * h_dim:xoff]
    for k in range(n_hidden):
        dhw[k][:] += ga[cout8 + k * h_dim:cout8 + (k + 1) * h_dim,
                        k * h_dim:(k + 1) * h_dim]
    r1 = cout8 + n_hidden * h_dim
    dw1pos_ref[:] += ga[r1:r1 + h_dim, xoff:xoff + 3]
    rf = r1 + h_dim
    dfourier_ref[:] += ga[rf:rf + fcount, xoff:xoff + 3]
    if has_direction:
        dw1dir_ref[:] += ga[r1:r1 + h_dim, xoff + 3:xoff + 6]
        dfdir_ref[:] += ga[rf:rf + fcount, xoff + 3:xoff + 6]
    # B: lhs dpre1, cols [cosf | sinf | lat]
    cols_b = [pad8(cosf), pad8(sinf)]
    if has_latent and lat is not None and lat.shape[0] <= 96 - 2 * f8b:
        cols_b.append(lat.astype(f32))
        gb = mm_ct(dpre1, jnp.concatenate(cols_b, axis=0))
        dw1lat_ref[:] += gb[:, 2 * f8b:2 * f8b + lat.shape[0]]
    else:
        gb = mm_ct(dpre1, jnp.concatenate(cols_b, axis=0))
        if has_latent and lat is not None:
            dw1lat_ref[:] += mm_ct(dpre1, lat)
    dw1cos_ref[:] += gb[:, 0:fcount]
    dw1sin_ref[:] += gb[:, f8b:f8b + fcount]
    return d_lat, dcarry_rows, (d_x_mlp, d_dirs_mlp)


def _emit_dlat(d_lat, wrep, oh, bf_aux, rows_ref, *, dlat_ref, dslot_ref,
               rowsout_ref, has_latent, latent_table, latent_subbox,
               latent_boxfeat, compact_slots, seg, tile):
    """Convert the raw latent cotangent to the per-segment kernel's
    output layout (boxfeat sub-box rows / one-hot sub-box / compacted
    slot rows / per-sample table rows / plain features)."""
    f32 = jnp.float32
    if has_latent:
        if latent_boxfeat:
            # dense per-(tile, segment) sub-box gradient via the
            # factorized trilerp transpose: expand d_feat (16, N) with
            # the x corner weights into per-part (128, N) cotangents,
            # contract the sample axis against the Khatri-Rao (z, y)
            # weights -> (SZYCP, 128) per x-block. Pad rows carry zero
            # weight, so the XLA scatter of repeated pad indices is
            # exact.
            szycp = latent_boxfeat[4]
            nxb = latent_boxfeat[3]
            for p_ in range(nxb):
                dm1 = jnp.concatenate(
                    [bf_aux.wx[p_ * 8 + rr:p_ * 8 + rr + 1, :] * d_lat
                     for rr in range(8)], axis=0)          # (128, N)
                dbp = jax.lax.dot_general(
                    bf_aux.wzy, dm1, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)            # (SZYCP, 128)
                dlat_ref[p_ * szycp:(p_ + 1) * szycp, :] = \
                    dbp.astype(dlat_ref.dtype)
        elif latent_subbox:
            # dense per-tile sub-box gradient: the transposed one-hot
            # contraction folds the per-sample scatter rows into
            # (SZ3P, 128) on the MXU -- replaces both the slot
            # compaction and (seg*tile)/SZ3 of the XLA scatter
            d_rows = d_lat * wrep                      # (128, N)
            dlat_ref[:] = jax.lax.dot_general(
                oh, d_rows, (((1,), (1,)), ((), ())),
                preferred_element_type=f32).astype(dlat_ref.dtype)
        elif latent_table and compact_slots:
            # Run compaction: consecutive steps of a ray that share a
            # base voxel are summed into one slot row, shrinking the
            # XLA scatter-add by seg/compact_slots. Slot id = prefix
            # count of row-change flags along the step axis (sample
            # column = j*tile + r, so "previous step" = lane shift by
            # tile). Samples beyond the slot budget (only possible for
            # unnormalized directions) are dropped.
            d_rows = d_lat * wrep                      # (128, N)
            rows_f = rows_ref[0]                       # (1, N) f32
            prev = jnp.concatenate(
                [jnp.full((1, tile), -1.0, f32), rows_f[:, :-tile]],
                axis=1)
            bnd = (rows_f != prev).astype(jnp.int32)
            ps = bnd
            k = 1
            while k < seg:                             # Hillis-Steele
                sh = k * tile
                ps = ps + jnp.concatenate(
                    [jnp.zeros((1, sh), jnp.int32), ps[:, :-sh]],
                    axis=1)
                k *= 2
            slot = ps - 1                              # (1, N) 0-based
            cols = []
            rids = []
            for sI in range(compact_slots):
                m = slot == sI
                vm = jnp.where(m, d_rows, 0.0)
                tot = jnp.zeros((d_rows.shape[0], tile), f32)
                rid = jnp.full((1, tile), -1.0, f32)
                for j in range(seg):
                    sl = slice(j * tile, (j + 1) * tile)
                    tot = tot + vm[:, sl]
                    rid = jnp.maximum(
                        rid, jnp.where(m[:, sl], rows_f[:, sl], -1.0))
                cols.append(tot)
                rids.append(rid)
            dslot_ref[:] = jnp.concatenate(cols, axis=1).T.astype(
                dslot_ref.dtype)                       # (slots*tile, 128)
            rowsout_ref[0] = jnp.concatenate(rids, axis=1)
        elif latent_table:
            dlat_ref[:] = (d_lat * wrep).T.astype(dlat_ref.dtype)
        else:
            dlat_ref[0] = d_lat
    elif not compact_slots:
        dlat_ref[:] = jnp.zeros_like(dlat_ref)


def make_segment_op(*, kernel_fwd, grid_spec_fwd, r_total, n_tiles,
                    n_samples, seg, tile, cl, use_table, has_latent,
                    n_hidden, kernel_kwargs, lat_shape, lat_dtype,
                    interpret, compact_slots=0, table_shape=None,
                    table_dtype=None, stash_rows=0):
    """Build the custom-VJP segment op with the hand-written backward
    kernel. Signature (s, rays, lat, carry, weights, tf_pad) ->
    carry_out; with ``compact_slots`` > 0 it is (s, rays, lat, rows,
    table, carry, weights, tf_pad) -> carry_out, where ``table`` is the
    neighborhood table whose cotangent is produced by the compacted
    slot-row scatter (the gather itself is stop-gradiented by the
    caller). In sub-box mode (kernel_kwargs['latent_subbox'] non-empty)
    it is (s, rays, sub, lrow, gr_f, table, carry, weights, tf_pad) ->
    carry_out: the table cotangent is the dense per-tile sub-box
    gradient scattered at the float-encoded global rows ``gr_f``."""
    dtype = jnp.float32
    subbox = tuple(kernel_kwargs.get("latent_subbox", ()) or ())
    boxfeat = tuple(kernel_kwargs.get("latent_boxfeat", ()) or ())
    bf_rows = boxfeat[3] * boxfeat[4] if boxfeat else 0

    if stash_rows:
        # activation-stash path: the forward kernel also emits the
        # per-layer activations/derivatives + fourier sincos, so the
        # backward kernel runs with ZERO transcendentals (no replay)
        out_shape = (jax.ShapeDtypeStruct((8, r_total), dtype),
                     jax.ShapeDtypeStruct((n_tiles * stash_rows,
                                           n_samples), dtype))
    else:
        out_shape = jax.ShapeDtypeStruct((8, r_total), dtype)
    fwd_call_raw = pl.pallas_call(
        kernel_fwd,
        grid_spec=grid_spec_fwd,
        out_shape=out_shape,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if stash_rows else None),
        interpret=interpret,
    )

    def fwd_call2(*args):
        out = fwd_call_raw(*args)
        return out if stash_rows else (out, None)

    def fwd_call(*args):
        return fwd_call2(*args)[0]

    kernel_bwd = functools.partial(_segment_bwd_kernel,
                                   n_hidden=n_hidden,
                                   compact_slots=compact_slots,
                                   want_stash=bool(stash_rows),
                                   **kernel_kwargs)

    def _run_bwd(s_arr, rays, lat, rows, carry, d_out, wlist,
                 stash=None):
        if boxfeat:
            lat_spec = pl.BlockSpec((bf_rows, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        elif subbox:
            lat_spec = pl.BlockSpec((subbox[3], 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        elif use_table:
            lat_spec = pl.BlockSpec((n_samples, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        else:
            lat_spec = pl.BlockSpec((1, cl, n_samples),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
        tile_spec = pl.BlockSpec((8, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            tile_spec,                               # rays
            lat_spec,
        ]
        ins = [s_arr, rays, lat]
        if boxfeat:
            # per-(tile, segment) scalars [base_y, base_z, xb0, K0]
            in_specs.append(pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                                         memory_space=pltpu.SMEM))
            ins.append(rows)
        elif compact_slots or subbox:
            # per-sample table rows (compact) / local sub-box rows
            in_specs.append(pl.BlockSpec((1, 1, n_samples),
                                         lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            ins.append(rows)
        if stash is not None:
            in_specs.append(pl.BlockSpec((stash_rows, n_samples),
                                         lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
            ins.append(stash)
        in_specs += [tile_spec, tile_spec]           # carry, dcarry
        ins += [carry, d_out]
        in_specs += [
            pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for w in wlist
        ]
        ins += wlist
        # outputs: d_lat (blocked per tile) -- d_slot + slot rows when
        # compacting, d_sub (SZ3P, 128) in sub-box mode -- then
        # d_carry_in (blocked) and accumulated weight/tf grads
        # (constant index maps)
        if boxfeat:
            out_specs = [
                pl.BlockSpec((bf_rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shapes = [
                jax.ShapeDtypeStruct((n_tiles * bf_rows, 128), dtype),
            ]
        elif subbox:
            out_specs = [
                pl.BlockSpec((subbox[3], 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shapes = [
                jax.ShapeDtypeStruct((n_tiles * subbox[3], 128), dtype),
            ]
        elif compact_slots:
            m = compact_slots * tile
            out_specs = [
                pl.BlockSpec((m, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shapes = [
                jax.ShapeDtypeStruct((n_tiles * m, 128), dtype),
                jax.ShapeDtypeStruct((n_tiles, 1, m), dtype),
            ]
        else:
            out_specs = [lat_spec]
            out_shapes = [jax.ShapeDtypeStruct(lat_shape, lat_dtype)]
        out_specs += [
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for w in wlist[:-1]    # all weights except tf...
        ] + [
            # d_tf: scalar SMEM accumulation for the few-point
            # piecewise/gaussian TFs; texture/preint tables (up to
            # 256+rows) accumulate as VMEM arrays via MXU contractions
            pl.BlockSpec(wlist[-1].shape,
                         (lambda i, nd=wlist[-1].ndim: (0,) * nd),
                         memory_space=(
                             pltpu.VMEM
                             if kernel_kwargs.get("tf_mode", "piecewise")
                             in ("texture", "preint1d", "preint2d")
                             else pltpu.SMEM))
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((8, r_total), dtype),
        ] + [jax.ShapeDtypeStruct(w.shape, dtype) for w in wlist]

        bwd_call = pl.pallas_call(
            kernel_bwd,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        return bwd_call(*ins)

    def _unpack_dw(dw, weights):
        # order matches weights_list: fourier, fourier_dir, w1pos,
        # w1dir, w1cos, w1sin, w1lat, b1, hidden_w..., hidden_b...,
        # w_out, b_out, tf; cotangent structure mirrors the primal
        # (None fields stay None)
        (d_fourier, d_fdir, d_w1pos, d_w1dir, d_w1cos, d_w1sin,
         d_w1lat, d_b1) = dw[:8]
        k = 8
        nh = n_hidden
        d_hw = tuple(dw[k:k + nh]); k += nh
        d_hb = tuple(dw[k:k + nh]); k += nh
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

    if boxfeat:
        # (s, rays, sub, base_pack, gr_f, p6, carry, weights, tf_pad):
        # the padded-grid cotangent is the dense per-tile sub-box
        # gradient scattered at the float-encoded gather rows gr_f;
        # AD chains d_p6 -> d latent_grid through build_boxfeat_grid.
        def segment(s_arr, rays, sub, base_pack, gr_f, table, carry,
                    weights: FusedWeights, tf_pad):
            del gr_f, table   # only consumed by the backward
            return fwd_call(s_arr, rays, sub, base_pack, carry,
                            *weights_list(weights, tf_pad))

        segment = jax.custom_vjp(segment)

        def segment_fwd(s_arr, rays, sub, base_pack, gr_f, table, carry,
                        weights, tf_pad):
            out, stash = fwd_call2(s_arr, rays, sub, base_pack, carry,
                                   *weights_list(weights, tf_pad))
            return out, (s_arr, rays, sub, base_pack, gr_f, carry,
                         weights, tf_pad, stash)

        def segment_bwd(res, d_out):
            (s_arr, rays, sub, base_pack, gr_f, carry, weights,
             tf_pad, stash) = res
            wlist = weights_list(weights, tf_pad)
            outs = _run_bwd(s_arr, rays, sub, base_pack, carry, d_out,
                            wlist, stash=stash)
            d_sub, d_carry = outs[0], outs[1]
            d_weights, d_tf = _unpack_dw(list(outs[2:]), weights)
            idx = gr_f.reshape(-1).astype(jnp.int32)
            # pad rows carry zero trilerp weight -> zero gradient, so a
            # plain in-bounds add of repeated pad indices is exact
            d_table = jnp.zeros(table_shape, dtype).at[idx].add(
                d_sub, mode="promise_in_bounds").astype(table_dtype)
            return (jnp.zeros((1, 1), jnp.float32),
                    jnp.zeros_like(rays), jnp.zeros_like(sub),
                    jnp.zeros_like(base_pack), jnp.zeros_like(gr_f),
                    d_table, d_carry, d_weights, d_tf)

        segment.defvjp(segment_fwd, segment_bwd)
        return segment

    if subbox:
        def segment(s_arr, rays, sub, lrow, gr_f, table, carry,
                    weights: FusedWeights, tf_pad):
            del gr_f, table   # only consumed by the backward
            return fwd_call(s_arr, rays, sub, lrow, carry,
                            *weights_list(weights, tf_pad))

        segment = jax.custom_vjp(segment)

        def segment_fwd(s_arr, rays, sub, lrow, gr_f, table, carry,
                        weights, tf_pad):
            out, stash = fwd_call2(s_arr, rays, sub, lrow, carry,
                                   *weights_list(weights, tf_pad))
            return out, (s_arr, rays, sub, lrow, gr_f, carry, weights,
                         tf_pad, stash)

        def segment_bwd(res, d_out):
            (s_arr, rays, sub, lrow, gr_f, carry, weights, tf_pad,
             stash) = res
            wlist = weights_list(weights, tf_pad)
            outs = _run_bwd(s_arr, rays, sub, lrow, carry, d_out, wlist,
                            stash=stash)
            d_sub, d_carry = outs[0], outs[1]
            d_weights, d_tf = _unpack_dw(list(outs[2:]), weights)
            idx = gr_f.reshape(-1).astype(jnp.int32)
            # pad rows repeat the base row and carry zero gradient, so a
            # plain in-bounds add is exact
            d_table = jnp.zeros((table_shape[0], 128), dtype).at[idx].add(
                d_sub, mode="promise_in_bounds").astype(table_dtype)
            return (jnp.zeros((1, 1), jnp.float32),
                    jnp.zeros_like(rays), jnp.zeros_like(sub),
                    jnp.zeros_like(lrow), jnp.zeros_like(gr_f),
                    d_table, d_carry, d_weights, d_tf)

        segment.defvjp(segment_fwd, segment_bwd)
        return segment

    if compact_slots:
        def segment(s_arr, rays, lat, rows, table, carry,
                    weights: FusedWeights, tf_pad):
            del rows, table   # only consumed by the backward
            return fwd_call(s_arr, rays, lat, carry,
                            *weights_list(weights, tf_pad))

        segment = jax.custom_vjp(segment)

        def segment_fwd(s_arr, rays, lat, rows, table, carry, weights,
                        tf_pad):
            out, stash = fwd_call2(s_arr, rays, lat, carry,
                                   *weights_list(weights, tf_pad))
            return out, (s_arr, rays, lat, rows, carry, weights, tf_pad,
                         stash)

        def segment_bwd(res, d_out):
            s_arr, rays, lat, rows, carry, weights, tf_pad, stash = res
            wlist = weights_list(weights, tf_pad)
            outs = _run_bwd(s_arr, rays, lat, rows, carry, d_out, wlist,
                            stash=stash)
            d_slot, slot_rows, d_carry = outs[0], outs[1], outs[2]
            d_weights, d_tf = _unpack_dw(list(outs[3:]), weights)
            idx = slot_rows.reshape(-1).astype(jnp.int32)
            # unused slots carry row -1 -> dropped as out-of-bounds
            d_table = jnp.zeros((table_shape[0], 128), dtype).at[idx].add(
                d_slot, mode="drop").astype(table_dtype)
            return (jnp.zeros((1, 1), jnp.float32),
                    jnp.zeros_like(rays), jnp.zeros_like(lat),
                    jnp.zeros_like(rows), d_table, d_carry, d_weights,
                    d_tf)

        segment.defvjp(segment_fwd, segment_bwd)
        return segment

    def segment(s_arr, rays, lat, carry, weights: FusedWeights,
                tf_pad):
        return fwd_call(s_arr, rays, lat, carry,
                        *weights_list(weights, tf_pad))

    segment = jax.custom_vjp(segment)

    def segment_fwd(s_arr, rays, lat, carry, weights, tf_pad):
        out, stash = fwd_call2(s_arr, rays, lat, carry,
                               *weights_list(weights, tf_pad))
        return out, (s_arr, rays, lat, carry, weights, tf_pad, stash)

    def segment_bwd(res, d_out):
        s_arr, rays, lat, carry, weights, tf_pad, stash = res
        wlist = weights_list(weights, tf_pad)
        outs = _run_bwd(s_arr, rays, lat, None, carry, d_out, wlist,
                        stash=stash)
        d_lat, d_carry = outs[0], outs[1]
        d_weights, d_tf = _unpack_dw(list(outs[2:]), weights)
        return (jnp.zeros((1, 1), jnp.float32), jnp.zeros_like(rays),
                d_lat.astype(lat_dtype), d_carry, d_weights, d_tf)

    segment.defvjp(segment_fwd, segment_bwd)
    return segment
