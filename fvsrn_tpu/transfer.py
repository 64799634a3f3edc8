"""Transfer functions.

TPU-native rebuild of the reference TF stack
(reference: renderer/transfer_function.h:25-92 ``ITransferFunction`` and the
device structs in renderer/renderer_tf_identity.cuh, renderer_tf_piecewise.cuh,
renderer_tf_texture.cuh, renderer_tf_gaussian.cuh).

Contract (identical to the reference kernels):
- ``eval_normalized(density, normal, previous_density, stepsize)`` takes a
  density already mapped to [0, 1]; ``previous_density < 0`` means "no
  previous sample" (first step / preintegration disabled). The returned rgba
  has the absorption channel **already multiplied by stepsize**.
- ``evaluate(...)`` mirrors the tensor API
  (reference: renderer/transfer_function.cpp:225-338 + renderer_tf_kernels.cuh
  ``EvaluateTF[WithPrevious]``): densities below ``density_min`` map to
  (0,0,0,0), the rest are normalized by (min, max) and sent through the TF.

All TFs support a leading batch axis on their parameter tensors (the
reference's ``getBatches`` machinery); ``eval_normalized`` evaluates batch
entry ``b`` against density array element-wise, with the *caller* responsible
for selecting/vmapping the batch (the renderer vmaps over the image batch).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .utils.pytree import static_field, struct
from .utils.vecmath import length, lerp

_SQRT_PI_2 = 0.8862269254527580  # sqrt(pi)/2


def _scale_absorption(rgba: Array, stepsize) -> Array:
    return rgba.at[..., 3].multiply(stepsize)


@struct
class TransferFunctionIdentity:
    """density -> (d*emission,)*3 rgb, d*absorption*stepsize opacity
    (reference: renderer/renderer_tf_identity.cuh:36-55)."""
    # (2,) or (B, 2): [absorption_scale, emission_scale]
    scale_absorption_emission: Array

    @classmethod
    def make(cls, absorption: float = 1.0, emission: float = 1.0):
        return cls(np.asarray([absorption, emission], dtype=np.float32))

    @property
    def batch(self) -> int:
        return (self.scale_absorption_emission.shape[0]
                if self.scale_absorption_emission.ndim == 2 else 1)

    def _params(self, b: int) -> Array:
        p = jnp.asarray(self.scale_absorption_emission)
        return p[b] if p.ndim == 2 else p

    def eval_normalized(self, density: Array, normal=None,
                        previous_density=None, stepsize=1.0, b: int = 0):
        p = self._params(b)
        d = jnp.clip(density, 0.0, 1.0)
        rgb = jnp.broadcast_to((d * p[1])[..., None], d.shape + (3,))
        alpha = (d * p[0] * stepsize)[..., None]
        return jnp.concatenate([rgb, alpha], axis=-1)

    def max_absorption(self) -> Array:
        p = jnp.atleast_2d(self.scale_absorption_emission)
        return jnp.max(p[:, 0])


@struct
class TransferFunctionPiecewiseLinear:
    """Piecewise-linear TF over control points.

    ``tensor`` is (R, 5) or (B, R, 5): [r, g, b, absorption, position] with
    positions ascending in [0, 1]
    (reference: renderer/renderer_tf_piecewise.cuh:27-64 ``sampleTF``/``eval``).
    """
    tensor: Array

    @classmethod
    def make(cls, rgb, opacity, positions):
        """Build from per-point rgb (R,3), opacity (R,), positions (R,)."""
        rgb = np.asarray(rgb, np.float32)
        opacity = np.asarray(opacity, np.float32)[:, None]
        positions = np.asarray(positions, np.float32)[:, None]
        return cls(np.concatenate([rgb, opacity, positions], axis=-1))

    @property
    def batch(self) -> int:
        return self.tensor.shape[0] if self.tensor.ndim == 3 else 1

    def _params(self, b: int) -> Array:
        t = jnp.asarray(self.tensor)
        return t[b] if t.ndim == 3 else t

    def eval_normalized(self, density: Array, normal=None,
                        previous_density=None, stepsize=1.0, b: int = 0):
        tf = self._params(b)  # (R, 5)
        r = tf.shape[0]
        d = jnp.clip(density, 0.0, 1.0)
        pos = tf[:, 4]
        # smallest i with pos[i+1] > d, else R-2
        # (reference: renderer_tf_piecewise.cuh:36-39)
        i = jnp.clip(jnp.searchsorted(pos, d, side="right") - 1, 0, r - 2)
        val0 = tf[i, :4]
        val1 = tf[i + 1, :4]
        p0 = pos[i]
        p1 = pos[i + 1]
        dc = jnp.clip(d, p0, p1)
        frac = (dc - p0) / (p1 - p0)
        rgba = lerp(val0, val1, frac[..., None])
        return _scale_absorption(rgba, stepsize)

    def max_absorption(self) -> Array:
        t = self.tensor if self.tensor.ndim == 3 else self.tensor[None]
        return jnp.max(t[..., 3])


@struct
class TransferFunctionTexture:
    """256-texel (typically) rgba lookup table with linear interpolation.

    ``tensor`` is (R, 4) or (B, R, 4); lookup at ``d*R - 0.5`` with clamped
    indices (reference: renderer/renderer_tf_texture.cuh:41-56, tensor mode).
    Optional 1D preintegration (mode 1) integrates the TF along the segment
    [previous_density, density] using a cumulative table
    (reference: renderer_tf_texture.cuh:62-84 + Compute1DPreintegrationTable,
    transfer_function.h:283-286).
    """
    tensor: Array
    preintegrated: Optional[Array] = None  # (R2,4) cumulative | (R2,R2,4)
    preintegration_mode: int = static_field(default=0)  # 0=off,1=1D,2=2D

    @property
    def batch(self) -> int:
        return self.tensor.shape[0] if self.tensor.ndim == 3 else 1

    def _params(self, b: int) -> Array:
        t = jnp.asarray(self.tensor)
        return t[b] if t.ndim == 3 else t

    @staticmethod
    def _lookup(table: Array, d: Array) -> Array:
        r = table.shape[0]
        x = d * r - 0.5
        i = jnp.floor(x).astype(jnp.int32)
        f = x - i
        v0 = table[jnp.clip(i, 0, r - 1)]
        v1 = table[jnp.clip(i + 1, 0, r - 1)]
        return lerp(v0, v1, f[..., None])

    def with_preintegration(self, resolution: int = 512):
        """Precompute the cumulative table V(s) = int_0^s c(d) tau(d) dd,
        tau-channel V.w(s) = int_0^s tau(d) dd."""
        tf = self._params(0)
        d = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
        samples = self._lookup(tf, d)  # (R2, 4)
        tau = samples[:, 3:]
        integrand = jnp.concatenate([samples[:, :3] * tau, tau], axis=-1)
        cum = jnp.cumsum(integrand, axis=0) / resolution
        cum = jnp.concatenate([jnp.zeros((1, 4), cum.dtype), cum], axis=0)
        return self.replace(preintegrated=cum, preintegration_mode=1)

    def with_preintegration_2d(self, resolution: int = 128,
                               stepsize: float = 1.0 / 256,
                               quadrature_steps: int = 32):
        """Full 2D preintegration table over (front, back) density pairs
        (reference: detail::Compute2DPreintegrationTable,
        transfer_function.h:283-286 + renderer_tf_texture.cuh mode 2):
        transmittance-weighted emission along a linear density segment of
        length ``stepsize``, stored premultiplied."""
        tf = self._params(0)
        s = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
        sf = s[:, None, None]  # front
        sb = s[None, :, None]  # back
        k = (jnp.arange(quadrature_steps, dtype=jnp.float32) + 0.5) \
            / quadrature_steps
        dens = sf + (sb - sf) * k[None, None, :]  # (R, R, K)
        rgba = self._lookup(tf, dens)             # (R, R, K, 4)
        tau = rgba[..., 3] * (stepsize / quadrature_steps)
        a_k = 1.0 - jnp.exp(-tau)                 # (R, R, K)
        trans = jnp.cumprod(1.0 - a_k, axis=-1)
        trans_before = jnp.concatenate(
            [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
        color = jnp.sum(rgba[..., :3] * (trans_before * a_k)[..., None],
                        axis=-2)                  # premultiplied rgb
        alpha = 1.0 - trans[..., -1]
        table = jnp.concatenate([color, alpha[..., None]], axis=-1)
        return self.replace(preintegrated=table, preintegration_mode=2)

    def eval_normalized(self, density: Array, normal=None,
                        previous_density=None, stepsize=1.0, b: int = 0):
        tf = self._params(b)
        d = jnp.clip(density, 0.0, 1.0)
        plain = self._lookup(tf, d)
        plain = _scale_absorption(plain, stepsize)
        if self.preintegration_mode == 0 or previous_density is None:
            return plain
        if self.preintegration_mode == 2:
            # 2D table lookup (reference: renderer_tf_texture.cuh:86-96):
            # rgba = tex2D(preintegrated, prev, d), premultiplication
            # removed when alpha > 1e-5
            prev = jnp.where(previous_density < 0, d, previous_density)
            r = self.preintegrated.shape[0]
            i = jnp.clip((jnp.clip(prev, 0, 1) * r).astype(jnp.int32),
                         0, r - 1)
            j = jnp.clip((d * r).astype(jnp.int32), 0, r - 1)
            rgba = self.preintegrated[i, j]
            w = rgba[..., 3]
            inv = jnp.where(w > 1e-5, 1.0 / jnp.maximum(w, 1e-5), 1.0)
            return jnp.concatenate(
                [rgba[..., :3] * inv[..., None], w[..., None]], axis=-1)
        # 1D preintegration (reference: renderer_tf_texture.cuh:62-84)
        prev = jnp.where(previous_density < 0, d, previous_density)
        table = self.preintegrated

        def _table(s):
            r = table.shape[0] - 1
            x = jnp.clip(s, 0.0, 1.0) * r
            i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, r - 1)
            f = x - i
            return lerp(table[i], table[i + 1], f[..., None])

        vsf = _table(prev)
        vsb = _table(d)
        denom = d - prev
        safe_denom = jnp.where(jnp.abs(denom) < 1e-3, 1.0, denom)
        rgb = stepsize * (vsb[..., :3] - vsf[..., :3]) / safe_denom[..., None]
        alpha = 1 - jnp.exp(-stepsize * (vsb[..., 3] - vsf[..., 3]) / safe_denom)
        inv_alpha = jnp.where(alpha > 1e-5, 1.0 / jnp.maximum(alpha, 1e-5), 1.0)
        rgb = rgb * inv_alpha[..., None]  # premultiplication removal
        pre = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
        return jnp.where((jnp.abs(denom) < 1e-3)[..., None], plain, pre)

    def max_absorption(self) -> Array:
        t = self.tensor if self.tensor.ndim == 3 else self.tensor[None]
        return jnp.max(t[..., 3])


@struct
class TransferFunctionGaussian:
    """Sum-of-Gaussians TF.

    ``tensor`` is (R, 6) or (B, R, 6): [r, g, b, opacity, mean, variance]
    (reference: renderer/renderer_tf_gaussian.cuh:36-88). ``analytic``
    enables piecewise analytic integration over [previous, current] density,
    ``scale_with_gradient`` modulates sigma by the gradient magnitude.
    """
    tensor: Array
    analytic: bool = static_field(default=False)
    scale_with_gradient: bool = static_field(default=False)

    @property
    def batch(self) -> int:
        return self.tensor.shape[0] if self.tensor.ndim == 3 else 1

    def _params(self, b: int) -> Array:
        t = jnp.asarray(self.tensor)
        return t[b] if t.ndim == 3 else t

    def eval_normalized(self, density: Array, normal=None,
                        previous_density=None, stepsize=1.0, b: int = 0):
        tf = self._params(b)  # (R, 6)
        d = jnp.clip(density, 0.0, 1.0)[..., None]  # (..., 1) over R
        ci = tf[:, :4]     # (R, 4)
        mu = tf[:, 4]      # (R,)
        sigma = tf[:, 5]
        if self.scale_with_gradient:
            if normal is None:
                raise ValueError("gradient-scaled gaussian TF requires normals")
            g = jnp.maximum(1e-5, length(normal) * 0.1)
            sigma = sigma * g  # broadcast (..., 1) * (R,) -> (..., R)
        ni_gauss = jnp.exp(-((d - mu) ** 2) / (sigma ** 2))
        if self.analytic and previous_density is not None:
            prev = previous_density[..., None]
            delta = prev - d
            safe_delta = jnp.where(jnp.abs(delta) < 1e-7, 1.0, delta)
            ni_analytic = _SQRT_PI_2 / safe_delta * sigma * (
                jax.scipy.special.erf((prev - mu) / sigma)
                + jax.scipy.special.erf((mu - d) / sigma))
            use_gauss = (prev < 0) | (jnp.abs(delta) < 1e-7)
            ni = jnp.where(use_gauss, ni_gauss, ni_analytic)
        else:
            ni = ni_gauss
        rgba = jnp.sum(ci * ni[..., None], axis=-2)  # sum over R
        return _scale_absorption(rgba, stepsize)

    def max_absorption(self) -> Array:
        # upper bound: sum of per-gaussian peak opacities
        t = self.tensor if self.tensor.ndim == 3 else self.tensor[None]
        return jnp.max(jnp.sum(jnp.maximum(t[..., 3], 0.0), axis=-1))


TransferFunction = Union[
    TransferFunctionIdentity,
    TransferFunctionPiecewiseLinear,
    TransferFunctionTexture,
    TransferFunctionGaussian,
]


def evaluate(tf, density: Array, density_min: float, density_max: float,
             previous_density: Optional[Array] = None,
             stepsize: Optional[float] = None,
             gradient: Optional[Array] = None,
             b: int = 0) -> Array:
    """Tensor-level TF evaluation, mirroring ``ITransferFunction::evaluate``
    (reference: renderer/transfer_function.cpp:225-338 and
    renderer/renderer_tf_kernels.cuh ``EvaluateTF[WithPrevious]``).

    density: (N, 1); returns colors (N, 4). Densities < density_min yield
    (0,0,0,0). With ``previous_density``+``stepsize``, preintegration-aware
    TFs integrate over the segment.
    """
    density = jnp.asarray(density)
    d = density[..., 0]
    inv_range = 1.0 / (density_max - density_min)
    d2 = (d - density_min) * inv_range
    prev2 = None
    if previous_density is not None:
        p = jnp.asarray(previous_density)[..., 0]
        prev2 = jnp.where(p >= 0, (p - density_min) * inv_range, -1.0)
    ss = 1.0 if stepsize is None else stepsize
    normal = gradient
    color = tf.eval_normalized(d2, normal, prev2, ss, b=b)
    return jnp.where((d >= density_min)[..., None], color,
                     jnp.zeros_like(color))
