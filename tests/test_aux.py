"""Auxiliary subsystem tests: compression baselines, warping, inpainting
(reference: compression/src/compression.cpp; renderer/warping.h;
renderer/inpainting.h)."""
import numpy as np
import jax.numpy as jnp

from fvsrn_tpu.compression import (
    MemoryTracker, compress_quantize, compress_tucker, compression_teaser,
    decompress_quantize, decompress_tucker)
from fvsrn_tpu.utils.imageops import inpaint, warp_image
from fvsrn_tpu.volume.implicit import create_implicit_grid


def test_tucker_compression():
    vol = np.asarray(create_implicit_grid(32, "SPHERE"))
    r = compress_tucker(vol, energy=1e-4)
    assert r.compressed_bytes < r.raw_bytes
    assert r.psnr > 35
    rec = decompress_tucker(r.payload)
    assert rec.shape == vol.shape
    # smooth fields compress massively under Tucker
    assert r.ratio > 4


def test_quantize_compression():
    vol = np.asarray(create_implicit_grid(24, "MARSCHNER_LOBB"))
    r8 = compress_quantize(vol, bits=8)
    assert r8.psnr > 40
    assert r8.ratio > 2
    rec = decompress_quantize(r8.payload)
    np.testing.assert_allclose(rec, vol, atol=(vol.max() - vol.min()) / 200)
    r4 = compress_quantize(vol, bits=4)
    # fewer levels -> coarser reconstruction (byte size depends on how LZ4
    # likes the bit pattern, so only the quality ordering is guaranteed)
    assert r4.psnr < r8.psnr


def test_memory_tracker_and_teaser():
    t = MemoryTracker()
    vol = np.asarray(create_implicit_grid(16, "SPHERE"))
    compress_tucker(vol, 1e-3, tracker=t)
    assert t.peak >= vol.nbytes
    assert t.current == 0
    table = compression_teaser(vol, network_bytes=1000)
    assert "network" in table
    assert table["quantize@8bit"]["psnr"] > 30


def test_warp_identity(rng):
    img = jnp.asarray(rng.random((3, 8, 10)), jnp.float32)
    out = warp_image(img, jnp.zeros((2, 8, 10)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               atol=1e-6)


def test_warp_shift(rng):
    img = jnp.asarray(rng.random((1, 6, 6)), jnp.float32)
    flow = jnp.zeros((2, 6, 6)).at[0].set(1.0)  # sample from x+1
    out = np.asarray(warp_image(img, flow))
    np.testing.assert_allclose(out[0, :, :5], np.asarray(img)[0, :, 1:],
                               atol=1e-6)


def test_inpaint_fills_holes(rng):
    img = jnp.ones((1, 16, 16)) * 0.7
    mask = jnp.ones((16, 16)).at[4:12, 4:12].set(0.0)
    noisy = img.at[0, 4:12, 4:12].set(99.0)  # garbage in the hole
    out = np.asarray(inpaint(noisy, mask))
    # known pixels unchanged, hole filled from surroundings
    np.testing.assert_allclose(out[0, 0, 0], 0.7, atol=1e-5)
    np.testing.assert_allclose(out[0, 8, 8], 0.7, atol=1e-3)
