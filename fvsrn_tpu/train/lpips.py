"""LPIPS perceptual metric (Zhang et al. 2018) in JAX.

Rebuild of the reference's bundled LPIPS
(reference: applications/losses/lpips/networks_basic.py ``PNetLin`` +
pretrained_networks.py): a frozen AlexNet/VGG16 feature stack, channel-wise
unit normalization at five taps, squared differences weighted by learned
1x1 linear heads, spatial mean, sum over taps.

Weights: the backbone is torchvision's ImageNet-pretrained ``alexnet`` /
``vgg16`` ``features`` state dict; the linear heads are
richzhang/PerceptualSimilarity v0.1 (``lpips/weights/v0.1/{alex,vgg}.pth``
-- the exact files the reference bundles). Neither ships with this
framework (no-download environment); point :func:`load_lpips` at local
copies (or set ``FVSRN_LPIPS_BACKBONE`` / ``FVSRN_LPIPS_LINEAR``). The
random-weight constructor exists so the machinery stays testable without
them.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct

# per-channel input normalization (reference: networks_basic.py
# ScalingLayer constants; inputs are rgb in [-1, 1])
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

# conv plans: (out_ch, kernel, stride, pad, tap_after, pool_before)
_ALEX_PLAN = [
    (64, 11, 4, 2, True, False),
    (192, 5, 1, 2, True, True),
    (384, 3, 1, 1, True, True),
    (256, 3, 1, 1, True, False),
    (256, 3, 1, 1, True, False),
]
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_VGG_TAPS = {1, 3, 6, 9, 12}  # conv index (0-based) after which to tap


def _vgg_plan():
    plan = []
    pool = False
    for v in _VGG_CFG:
        if v == "M":
            pool = True
            continue
        idx = len(plan)
        plan.append((v, 3, 1, 1, idx in _VGG_TAPS, pool))
        pool = False
    return plan


def _plan(arch: str):
    if arch == "alex":
        return _ALEX_PLAN
    if arch == "vgg":
        return _vgg_plan()
    raise ValueError(f"unknown LPIPS backbone '{arch}' (alex|vgg)")


@struct
class LPIPS:
    """Frozen LPIPS model: conv stack + per-tap linear head weights."""
    conv_w: tuple            # ((O, I, K, K) f32, ...)
    conv_b: tuple            # ((O,) f32, ...)
    lin_w: tuple             # ((C,) f32 per tap, ...)
    arch: str = static_field(default="alex")

    def features(self, rgb: Array) -> list:
        """Tap activations for (B, 3, H, W) rgb in [-1, 1]."""
        x = (rgb - _SHIFT[None, :, None, None]) / _SCALE[None, :, None,
                                                         None]
        pk, ps = (3, 2) if self.arch == "alex" else (2, 2)
        taps = []
        for (o, k, s, p, tap, pool), w, b in zip(
                _plan(self.arch), self.conv_w, self.conv_b):
            if pool:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, pk, pk),
                    (1, 1, ps, ps), "VALID")
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = jax.nn.relu(x + b[None, :, None, None])
            if tap:
                taps.append(x)
        return taps

    def __call__(self, pred_rgb: Array, ref_rgb: Array) -> Array:
        """LPIPS distance for (B, 3, H, W) rgb pairs in [0, 1].
        Returns (B,) distances (reference: networks_basic.py forward,
        spatial=False)."""
        p = self.features(pred_rgb * 2.0 - 1.0)
        r = self.features(ref_rgb * 2.0 - 1.0)
        total = 0.0
        for fp, fr, lw in zip(p, r, self.lin_w):
            # channel-wise unit normalization (normalize_tensor)
            np_ = fp / jnp.sqrt(jnp.sum(fp ** 2, axis=1,
                                        keepdims=True) + 1e-10)
            nr = fr / jnp.sqrt(jnp.sum(fr ** 2, axis=1,
                                       keepdims=True) + 1e-10)
            d = (np_ - nr) ** 2
            w = jnp.maximum(lw, 0.0)  # heads are learned non-negative
            total = total + jnp.mean(
                jnp.sum(d * w[None, :, None, None], axis=1), axis=(1, 2))
        return total


def lpips_random(arch: str = "alex", seed: int = 0) -> LPIPS:
    """Random-weight LPIPS (machinery testing only -- NOT perceptual)."""
    rng = np.random.default_rng(seed)
    cw, cb, lw = [], [], []
    cin = 3
    for (o, k, s, p, tap, pool) in _plan(arch):
        std = 1.0 / np.sqrt(cin * k * k)
        cw.append(jnp.asarray(
            rng.normal(0, std, (o, cin, k, k)).astype(np.float32)))
        cb.append(jnp.zeros((o,), jnp.float32))
        if tap:
            lw.append(jnp.asarray(
                rng.random(o).astype(np.float32) / o))
        cin = o
    return LPIPS(conv_w=tuple(cw), conv_b=tuple(cb), lin_w=tuple(lw),
                 arch=arch)


def load_lpips(backbone_path: Optional[str] = None,
               linear_path: Optional[str] = None,
               arch: str = "alex") -> LPIPS:
    """Build LPIPS from torch checkpoints.

    ``backbone_path``: torchvision ``alexnet``/``vgg16`` state dict (keys
    ``features.N.{weight,bias}``). ``linear_path``: LPIPS v0.1 linear-head
    state dict (keys ``linN.model.1.weight``, shape (1, C, 1, 1)). Falls
    back to ``FVSRN_LPIPS_BACKBONE`` / ``FVSRN_LPIPS_LINEAR`` env vars.
    """
    import torch

    backbone_path = backbone_path or os.environ.get("FVSRN_LPIPS_BACKBONE")
    linear_path = linear_path or os.environ.get("FVSRN_LPIPS_LINEAR")
    if not backbone_path or not linear_path:
        raise FileNotFoundError(
            "LPIPS weights not configured: pass backbone_path/linear_path "
            "or set FVSRN_LPIPS_BACKBONE / FVSRN_LPIPS_LINEAR. Backbone = "
            "torchvision alexnet/vgg16 checkpoint; linear heads = "
            "richzhang/PerceptualSimilarity v0.1 (the reference bundles "
            "them at applications/losses/lpips/weights/v0.1/).")
    bsd = torch.load(backbone_path, map_location="cpu", weights_only=True)
    lsd = torch.load(linear_path, map_location="cpu", weights_only=True)
    conv_keys = sorted(
        (k for k in bsd if k.startswith("features.")
         and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[1]))
    plan = _plan(arch)
    if len(conv_keys) != len(plan):
        raise ValueError(
            f"backbone has {len(conv_keys)} convs, {arch} needs "
            f"{len(plan)}")
    cw = tuple(jnp.asarray(bsd[k].numpy()) for k in conv_keys)
    cb = tuple(jnp.asarray(bsd[k[:-6] + "bias"].numpy())
               for k in conv_keys)
    lw = tuple(jnp.asarray(
        lsd[f"lin{i}.model.1.weight"].numpy()[0, :, 0, 0])
        for i in range(5))
    for (o, *_), w in zip(plan, cw):
        if w.shape[0] != o:
            raise ValueError(f"conv shape mismatch: {w.shape} vs out={o}")
    return LPIPS(conv_w=cw, conv_b=cb, lin_w=lw, arch=arch)
