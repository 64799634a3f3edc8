"""Training losses: L1/L2, SSIM/DSSIM, LPIPS (weight-gated).

Rebuild of the reference loss stack
(reference: applications/volnet/lossnet.py:60-225 ``LossNetScreen``/
``LossNetWorld``; applications/losses/ssim.py for SSIM). LPIPS is fully
implemented (fvsrn_tpu.train.lpips: AlexNet/VGG16 stack + v0.1 linear
heads) but the pretrained weights are binary blobs the reference vendors;
load them with ``lpips.load_lpips`` and attach the model as
``LossNetScreen.lpips_model`` -- requesting lpips without a model raises.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct


def l1_loss(pred: Array, ref: Array) -> Array:
    return jnp.mean(jnp.abs(pred - ref))


def l2_loss(pred: Array, ref: Array) -> Array:
    return jnp.mean((pred - ref) ** 2)


def _gaussian_window(size: int, sigma: float, dtype=jnp.float32) -> Array:
    x = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def ssim(pred: Array, ref: Array, *, window_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0) -> Array:
    """SSIM over (B, C, H, W) images, gaussian-windowed (Wang et al. 2004;
    semantics of applications/losses/ssim.py:22)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    w1d = _gaussian_window(window_size, sigma, pred.dtype)
    window = jnp.outer(w1d, w1d)[None, None]  # (1, 1, K, K)

    def filt(x):
        b, c, h, w = x.shape
        xr = x.reshape(b * c, 1, h, w)
        # HIGHEST precision: XLA:TPU's default rounds conv operands to
        # bf16, which corrupts the E[x^2]-mu^2 variance cancellation
        # (measured: SSIM 1.005 on a near-perfect pair, and depressed
        # scores on real pairs); bf16x6 passes restore f32 accuracy
        y = jax.lax.conv_general_dilated(
            xr, window, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        return y.reshape(b, c, y.shape[2], y.shape[3])

    mu1 = filt(pred)
    mu2 = filt(ref)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(pred * pred) - mu1_sq
    sigma2_sq = filt(ref * ref) - mu2_sq
    sigma12 = filt(pred * ref) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def dssim(pred: Array, ref: Array, **kw) -> Array:
    """Structural dissimilarity (1 - SSIM) / 2."""
    return (1.0 - ssim(pred, ref, **kw)) / 2.0


# ---------------------------------------------------------------------------
# LPIPS (perceptual loss): full architecture in fvsrn_tpu.train.lpips;
# attach a model (loaded or random) as LossNetScreen.lpips_model.


def lpips_unavailable_error():
    return RuntimeError(
        "LPIPS requested (lpips > 0) but no model attached: build one with "
        "fvsrn_tpu.train.lpips.load_lpips(backbone_path, linear_path) "
        "(torchvision alexnet/vgg16 checkpoint + richzhang/"
        "PerceptualSimilarity v0.1 linear heads -- the files the reference "
        "bundles at applications/losses/lpips/weights/) and pass it as "
        "LossNetScreen(lpips=..., lpips_model=model).")


@struct
class LossNetScreen:
    """Screen-space (image) loss
    (reference: lossnet.py:60-142): weighted L1 + L2 + DSSIM [+ LPIPS] on
    (B, 4, H, W) rgba images; ``multiply_alpha`` premultiplies prediction
    and reference rgb by the *reference* alpha."""
    l1: float = static_field(default=0.0)
    l2: float = static_field(default=0.0)
    dssim: float = static_field(default=0.0)
    lpips: float = static_field(default=0.0)
    multiply_alpha: bool = static_field(default=False)
    lpips_model: Optional[object] = None  # fvsrn_tpu.train.lpips.LPIPS

    def __call__(self, prediction: Array, reference: Array,
                 return_individual: bool = False):
        assert reference.ndim == 4 and reference.shape[1] == 4
        color_channels = 3 if self.multiply_alpha else 4
        if self.multiply_alpha:
            alpha = reference[:, 3:]
            prediction = jnp.concatenate(
                [prediction[:, :3] * alpha, prediction[:, 3:]], axis=1)
            reference = jnp.concatenate(
                [reference[:, :3] * alpha, alpha], axis=1)
        vals = {}
        vals["l1"] = l1_loss(prediction, reference)
        vals["l2"] = l2_loss(prediction, reference)
        if self.dssim > 0:
            vals["dssim"] = dssim(prediction[:, :color_channels],
                                  reference[:, :color_channels])
        else:
            vals["dssim"] = jnp.zeros(())
        if self.lpips > 0:
            if self.lpips_model is None:
                raise lpips_unavailable_error()
            vals["lpips"] = jnp.mean(self.lpips_model(
                prediction[:, :3], reference[:, :3]))
        else:
            vals["lpips"] = jnp.zeros(())
        total = (self.l1 * vals["l1"] + self.l2 * vals["l2"]
                 + self.dssim * vals["dssim"]
                 + self.lpips * vals["lpips"])
        vals["total"] = total
        if return_individual:
            return total, vals
        return total


@struct
class LossNetWorld:
    """World-space (sample) loss (reference: lossnet.py:145-225):
    mode 'density' -> L1/L2 on (N, 1); mode 'rgbo' -> L1/L2 on rgb with
    absorption weighted by ``absorption_weighting``."""
    mode: str = static_field(default="density")
    l1: float = static_field(default=1.0)
    l2: float = static_field(default=0.0)
    absorption_weighting: float = static_field(default=0.1)

    def __call__(self, prediction: Array, reference: Array,
                 return_individual: bool = False):
        if self.mode == "density":
            vals = {"l1": l1_loss(prediction, reference),
                    "l2": l2_loss(prediction, reference)}
            total = self.l1 * vals["l1"] + self.l2 * vals["l2"]
        else:
            x_rgb, x_a = prediction[..., :3], prediction[..., 3:]
            y_rgb, y_a = reference[..., :3], reference[..., 3:]
            vals = {
                "l1rgb": l1_loss(x_rgb, y_rgb),
                "l1alpha": l1_loss(x_a, y_a),
                "l2rgb": l2_loss(x_rgb, y_rgb),
                "l2alpha": l2_loss(x_a, y_a),
            }
            total = (self.l1 * vals["l1rgb"]
                     + self.l1 * self.absorption_weighting * vals["l1alpha"]
                     + self.l2 * vals["l2rgb"]
                     + self.l2 * self.absorption_weighting * vals["l2alpha"])
        vals["total"] = total
        if return_individual:
            return total, vals
        return total
