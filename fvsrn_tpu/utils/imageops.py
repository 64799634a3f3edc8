"""Image-space utilities: flow warping and pyramid inpainting.

Rebuild of the reference's super-resolution helpers
(reference: renderer/warping.h:8-30 ``warp`` -- optical-flow bilinear image
warping -- and renderer/inpainting.h:8-40 + inpainting.cu:346 -- masked
pyramid inpainting used by the super-resolution experiments).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def warp_image(image: Array, flow: Array) -> Array:
    """Backward-warp ``image`` (C, H, W) by ``flow`` (2, H, W) pixels:
    out[c, y, x] = image[c, y + flow[1], x + flow[0]] with bilinear
    sampling and border clamping (reference: warping.h:8-30)."""
    c, h, w = image.shape
    yy = jnp.arange(h, dtype=flow.dtype)[:, None]
    xx = jnp.arange(w, dtype=flow.dtype)[None, :]
    sx = xx + flow[0]
    sy = yy + flow[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    i00 = image[:, y0, x0]
    i01 = image[:, y0, x1]
    i10 = image[:, y1, x0]
    i11 = image[:, y1, x1]
    top = i00 + (i01 - i00) * fx
    bot = i10 + (i11 - i10) * fx
    return top + (bot - top) * fy


def inpaint(image: Array, mask: Array, levels: int | None = None) -> Array:
    """Fill unknown pixels (mask == 0) by pyramid down/up diffusion
    (reference: inpainting.h ``fastInpaint``: average-downsample the
    masked image to a coarse level, then upsample filling only holes).

    image (C, H, W), mask (H, W) with 1 = known. Returns the filled image.
    """
    c, h, w = image.shape
    if levels is None:
        levels = max(1, int(jnp.ceil(jnp.log2(max(h, w)))) if False
                     else (max(h, w)).bit_length())

    def down(img, m):
        # masked 2x2 average pooling
        ih, iw = img.shape[1], img.shape[2]
        ph, pw = (ih + 1) // 2 * 2, (iw + 1) // 2 * 2
        img = jnp.pad(img, ((0, 0), (0, ph - ih), (0, pw - iw)))
        m2 = jnp.pad(m, ((0, ph - ih), (0, pw - iw)))
        s = (img * m2).reshape(c, ph // 2, 2, pw // 2, 2).sum((2, 4))
        n = m2.reshape(ph // 2, 2, pw // 2, 2).sum((1, 3))
        return s / jnp.maximum(n, 1e-8), (n > 0).astype(m.dtype)

    # build pyramid
    imgs = [image * mask[None]]
    masks = [mask]
    while imgs[-1].shape[1] > 1 or imgs[-1].shape[2] > 1:
        i2, m2 = down(imgs[-1], masks[-1])
        imgs.append(i2)
        masks.append(m2)
        if len(imgs) > 32:
            break

    # coarse-to-fine fill
    filled = imgs[-1]
    for lvl in range(len(imgs) - 2, -1, -1):
        target = imgs[lvl]
        m = masks[lvl]
        hh, ww = target.shape[1], target.shape[2]
        up = jnp.repeat(jnp.repeat(filled, 2, axis=1), 2,
                        axis=2)[:, :hh, :ww]
        filled = jnp.where(m[None] > 0, target, up)
    return filled
