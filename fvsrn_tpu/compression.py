"""Volume compression baselines.

Rebuild of the reference's compression tower
(reference: compression/src/compression.cpp:1-821 TThresh + cudaCompress
wrappers exposed as ``pyrenderer.compression``, bindings.cpp:285-606, with
allocation tracking in memtrace.cpp): the baselines the SRN is compared
against (reference: applications/volnet/eval_CompressionTeaser.py).

Provided codecs (from scratch, no vendored coders):
- ``tthresh``: full HOSVD + error-driven bitplane truncation + native
  ADAPTIVE ARITHMETIC coding with significance/refinement/sign contexts
  (fvsrn_tpu/native/arith.cpp) -- the paper's three mechanisms.
- ``tucker``: HOSVD/Tucker decomposition with energy-threshold rank
  truncation plus fp16 factor storage and native-LZ4 entropy coding.
- ``dwt``: multi-level CDF 9/7 lifting DWT + uniform quantization +
  arithmetic bitplane coding -- the cudaCompress pipeline shape
  (DWT/quantizer/coder), built from scratch; ``dwt_chunked`` adds the
  per-brick payload structure for INTERACTIVE decompression
  (decode only the bricks a view touches, like compression_cu.cu).
- ``quantize``: uniform scalar quantization to b bits + LZ4.

Both report compressed byte sizes and reconstruction errors, and a
``MemoryTracker`` mirrors the reference's allocation bookkeeping.
"""
from __future__ import annotations

import io
import pickle
import struct
from dataclasses import dataclass

import numpy as np

from .volume import lz4io


@dataclass
class CompressionResult:
    payload: bytes
    compressed_bytes: int
    raw_bytes: int
    psnr: float

    @property
    def ratio(self) -> float:
        return self.raw_bytes / max(self.compressed_bytes, 1)


class MemoryTracker:
    """Peak/current allocation bookkeeping
    (reference: compression/src/memtrace.cpp)."""

    def __init__(self):
        self.current = 0
        self.peak = 0

    def alloc(self, nbytes: int):
        self.current += nbytes
        self.peak = max(self.peak, self.current)

    def free(self, nbytes: int):
        self.current -= nbytes


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64))
                        ** 2))
    if mse == 0:
        return float("inf")
    rng = float(a.max() - a.min()) or 1.0
    return 10.0 * np.log10(rng * rng / mse)


def _mode_product(core: np.ndarray, factor: np.ndarray,
                  mode: int) -> np.ndarray:
    """core x_mode factor (factor: (new_dim, old_dim))."""
    core = np.moveaxis(core, mode, 0)
    shape = core.shape
    out = factor @ core.reshape(shape[0], -1)
    out = out.reshape((factor.shape[0],) + shape[1:])
    return np.moveaxis(out, 0, mode)


def compress_tucker(volume: np.ndarray, energy: float = 1e-4,
                    tracker: MemoryTracker | None = None
                    ) -> CompressionResult:
    """Tucker/HOSVD compression with relative energy threshold.

    volume: (X, Y, Z) float array. ``energy`` is the fraction of squared
    norm allowed to be discarded per mode (smaller = higher quality).
    """
    v = np.asarray(volume, np.float32)
    if tracker:
        tracker.alloc(v.nbytes)
    core = v.astype(np.float64)
    factors = []
    for mode in range(3):
        unfold = np.moveaxis(core, mode, 0).reshape(core.shape[mode], -1)
        u, s, _ = np.linalg.svd(unfold, full_matrices=False)
        cum = np.cumsum(s[::-1] ** 2)[::-1]
        total = float((s ** 2).sum()) or 1.0
        rank = int(np.searchsorted(-cum, -energy * total) or 1)
        rank = max(1, min(rank, len(s)))
        factors.append(u[:, :rank])
        core = _mode_product(core, u[:, :rank].T, mode)
    blob = {
        "shape": v.shape,
        "core": core.astype(np.float32),
        "factors": [f.astype(np.float16) for f in factors],
    }
    raw = pickle.dumps(blob)
    payload = lz4io.compress(raw) if lz4io.available() else raw
    header = struct.pack("<ii", len(raw), 1 if lz4io.available() else 0)
    data = header + payload
    rec = decompress_tucker(data)
    if tracker:
        tracker.free(v.nbytes)
    return CompressionResult(payload=data, compressed_bytes=len(data),
                             raw_bytes=v.nbytes, psnr=_psnr(v, rec))


def decompress_tucker(data: bytes) -> np.ndarray:
    raw_len, compressed = struct.unpack("<ii", data[:8])
    body = data[8:]
    raw = lz4io.decompress(body, raw_len) if compressed else body
    blob = pickle.loads(raw)
    core = blob["core"].astype(np.float64)
    for mode, f in enumerate(blob["factors"]):
        core = _mode_product(core, f.astype(np.float64), mode)
    return core.astype(np.float32)


def compress_tthresh(volume: np.ndarray, eps: float = 1e-3,
                     tracker: MemoryTracker | None = None
                     ) -> CompressionResult:
    """TThresh-style compression: full HOSVD + ERROR-DRIVEN BITPLANE
    truncation of the core (Ballester-Ripoll, Lindstrom & Pajarola,
    "TTHRESH: Tensor Compression for Multidimensional Visual Data";
    the codec the reference vendors, compression/src/compression.cpp:
    1-821 ``compressTThresh*``).

    The two defining mechanisms are reproduced from the paper:
    1. FULL-rank HOSVD (orthogonal factors) so the core's squared error
       equals the volume's -- rate control happens on coefficients, not
       ranks (unlike :func:`compress_tucker`'s rank truncation);
    2. the core's |coefficients| are scaled to integers and cut at the
       lowest BITPLANE P whose total squared error stays within
       ``eps^2 * ||volume||^2`` -- P is found exactly by scanning the
       64 candidate planes vectorized.

    Entropy stage (round 4): the surviving planes are coded by the
    native ADAPTIVE ARITHMETIC bitplane coder
    (fvsrn_tpu/native/arith.cpp -- significance/refinement/sign
    contexts; the zero runs the paper handles with RLE are absorbed by
    the per-plane significance contexts), matching the paper's
    arithmetic-coder design; factors are stored f16 like the
    reference's float mode. Falls back to LZ4-over-packed-planes when
    the native library cannot build.
    """
    v = np.asarray(volume, np.float32)
    if tracker:
        tracker.alloc(v.nbytes)
    core = v.astype(np.float64)
    factors = []
    for mode in range(3):
        unfold = np.moveaxis(core, mode, 0).reshape(core.shape[mode], -1)
        u, _s, _ = np.linalg.svd(unfold, full_matrices=False)
        factors.append(u)
        core = _mode_product(core, u.T, mode)
    c = core.ravel()
    amax = float(np.abs(c).max()) or 1.0
    q = np.round(np.abs(c) / amax * float(2 ** 62)).astype(np.uint64)
    sign = (c < 0)
    # exact error per candidate cutoff plane: dropping the low P bits
    # leaves q >> P << P; scan P from 0 up until the error budget breaks
    budget = (eps * eps) * float(np.sum(c * c))
    scale_back = amax / float(2 ** 62)
    cut = 0
    for p in range(0, 63):
        kept = (q >> np.uint64(p)) << np.uint64(p)
        err = float(np.sum(((q - kept) * scale_back).astype(np.float64)
                           ** 2))
        if err > budget:
            break
        cut = p
    kept = (q >> np.uint64(cut)).astype(np.uint64)
    nbits = max(1, int(kept.max()).bit_length())
    nz = kept != 0
    blob = {
        "shape": v.shape,
        "cut": cut,
        "amax": amax,
        "nbits": nbits,
        "factors": [f.astype(np.float16) for f in factors],
    }
    from . import arith
    if arith.available():
        blob["entropy"] = "ac"
        blob["coeffs"] = arith.encode_planes(
            kept, sign.astype(np.uint8), nbits)
    else:
        # fallback: packed bitplanes MSB first + the LZ4 envelope (high
        # planes are almost entirely zero, so LZ4 collapses them)
        blob["entropy"] = "lz4planes"
        planes = [np.packbits(((kept >> np.uint64(p)) & np.uint64(1))
                              .astype(np.uint8)).tobytes()
                  for p in range(nbits - 1, -1, -1)]
        blob["coeffs"] = b"".join(planes)
        blob["signs"] = np.packbits(sign[nz].astype(np.uint8)).tobytes()
        blob["n_nz"] = int(nz.sum())
    raw = pickle.dumps(blob)
    payload = lz4io.compress(raw) if lz4io.available() else raw
    header = struct.pack("<ii", len(raw), 1 if lz4io.available() else 0)
    data = header + payload
    rec = decompress_tthresh(data)
    if tracker:
        tracker.free(v.nbytes)
    return CompressionResult(payload=data, compressed_bytes=len(data),
                             raw_bytes=v.nbytes, psnr=_psnr(v, rec))


def decompress_tthresh(data: bytes) -> np.ndarray:
    raw_len, compressed = struct.unpack("<ii", data[:8])
    body = data[8:]
    raw = lz4io.decompress(body, raw_len) if compressed else body
    blob = pickle.loads(raw)
    shape = blob["shape"]
    n = int(np.prod(shape))
    nbits = blob["nbits"]
    if blob.get("entropy") == "ac":
        from . import arith
        kept, signs_u8 = arith.decode_planes(blob["coeffs"], n, nbits)
        sgn = np.where(signs_u8.astype(bool), -1.0, 1.0)
    else:
        plane_bytes = -(-n // 8)
        kept = np.zeros(n, np.uint64)
        buf = blob["coeffs"]
        for k in range(nbits):
            p = nbits - 1 - k
            bits = np.unpackbits(np.frombuffer(
                buf[k * plane_bytes:(k + 1) * plane_bytes], np.uint8))[:n]
            kept |= bits.astype(np.uint64) << np.uint64(p)
        nz = kept != 0
        signs = np.unpackbits(
            np.frombuffer(blob["signs"], np.uint8))[:blob["n_nz"]]
        sgn = np.ones(n, np.float64)
        sgn[nz] = np.where(signs.astype(bool), -1.0, 1.0)
    mag = (kept << np.uint64(blob["cut"])).astype(np.float64) \
        * (blob["amax"] / float(2 ** 62))
    core = (mag * sgn).reshape(shape)
    for mode, f in enumerate(blob["factors"]):
        core = _mode_product(core, f.astype(np.float64), mode)
    return core.astype(np.float32)


def compress_quantize(volume: np.ndarray, bits: int = 8,
                      tracker: MemoryTracker | None = None
                      ) -> CompressionResult:
    """Uniform scalar quantization + LZ4."""
    v = np.asarray(volume, np.float32)
    if tracker:
        tracker.alloc(v.nbytes)
    lo = float(v.min())
    hi = float(v.max())
    scale = (hi - lo) or 1.0
    levels = (1 << bits) - 1
    q = np.round((v - lo) / scale * levels)
    dt = np.uint8 if bits <= 8 else np.uint16
    raw = q.astype(dt).tobytes()
    payload = lz4io.compress(raw) if lz4io.available() else raw
    header = struct.pack("<3i2fB", len(raw),
                         1 if lz4io.available() else 0, bits, lo, scale,
                         len(v.shape))
    header += struct.pack(f"<{len(v.shape)}i", *v.shape)
    data = header + payload
    rec = decompress_quantize(data)
    if tracker:
        tracker.free(v.nbytes)
    return CompressionResult(payload=data, compressed_bytes=len(data),
                             raw_bytes=v.nbytes, psnr=_psnr(v, rec))


def decompress_quantize(data: bytes) -> np.ndarray:
    raw_len, compressed, bits, lo, scale, ndim = struct.unpack(
        "<3i2fB", data[:21])
    shape = struct.unpack(f"<{ndim}i", data[21:21 + 4 * ndim])
    body = data[21 + 4 * ndim:]
    raw = lz4io.decompress(body, raw_len) if compressed else body
    dt = np.uint8 if bits <= 8 else np.uint16
    levels = (1 << bits) - 1
    q = np.frombuffer(raw, dt).reshape(shape).astype(np.float32)
    return q / levels * scale + lo


# -- CDF 9/7 DWT codec (the cudaCompress pipeline shape) -------------------
# Lifting coefficients of the Cohen-Daubechies-Feauveau 9/7 wavelet
# (the JPEG2000 irreversible filter cudaCompress uses).
_CDF97_A = -1.586134342059924
_CDF97_B = -0.05298011857296141
_CDF97_G = 0.8829110755309332
_CDF97_D = 0.44350685204390013
_CDF97_K = 1.1496043988602418


def _lift_fwd(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """CDF 9/7 forward lifting along axis 0 (even length, symmetric
    extension). Returns (lowpass, highpass), each half length."""
    s = x[0::2].astype(np.float64, copy=True)
    d = x[1::2].astype(np.float64, copy=True)
    d += _CDF97_A * (s + np.concatenate([s[1:], s[-1:]], axis=0))
    s += _CDF97_B * (np.concatenate([d[:1], d[:-1]], axis=0) + d)
    d += _CDF97_G * (s + np.concatenate([s[1:], s[-1:]], axis=0))
    s += _CDF97_D * (np.concatenate([d[:1], d[:-1]], axis=0) + d)
    return s * _CDF97_K, d / _CDF97_K


def _lift_inv(s: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Exact inverse of :func:`_lift_fwd` (reversed lifting steps)."""
    s = s / _CDF97_K
    d = d * _CDF97_K
    s = s - _CDF97_D * (np.concatenate([d[:1], d[:-1]], axis=0) + d)
    d = d - _CDF97_G * (s + np.concatenate([s[1:], s[-1:]], axis=0))
    s = s - _CDF97_B * (np.concatenate([d[:1], d[:-1]], axis=0) + d)
    d = d - _CDF97_A * (s + np.concatenate([s[1:], s[-1:]], axis=0))
    x = np.empty((s.shape[0] * 2,) + s.shape[1:], np.float64)
    x[0::2] = s
    x[1::2] = d
    return x


def _dwt3(v: np.ndarray, levels: int) -> np.ndarray:
    """Multi-level separable 3D CDF 9/7 DWT, lowpass packed into the
    leading half per axis per level (the standard Mallat layout)."""
    out = v.astype(np.float64, copy=True)
    nx, ny, nz = out.shape
    for lv in range(levels):
        sx, sy, sz = nx >> lv, ny >> lv, nz >> lv
        blk = out[:sx, :sy, :sz]
        for ax in range(3):
            m = np.moveaxis(blk, ax, 0)
            s, d = _lift_fwd(m)
            np.moveaxis(blk, ax, 0)[:] = np.concatenate([s, d], axis=0)
        out[:sx, :sy, :sz] = blk
    return out


def _idwt3(c: np.ndarray, levels: int) -> np.ndarray:
    out = c.astype(np.float64, copy=True)
    nx, ny, nz = out.shape
    for lv in range(levels - 1, -1, -1):
        sx, sy, sz = nx >> lv, ny >> lv, nz >> lv
        blk = out[:sx, :sy, :sz]
        for ax in range(2, -1, -1):
            m = np.moveaxis(blk, ax, 0)
            h = m.shape[0] // 2
            np.moveaxis(blk, ax, 0)[:] = _lift_inv(m[:h], m[h:])
        out[:sx, :sy, :sz] = blk
    return out


def compress_dwt(volume: np.ndarray, step: float = 3e-3,
                 levels: int = 3,
                 tracker: MemoryTracker | None = None
                 ) -> CompressionResult:
    """cudaCompress-shaped codec: multi-level CDF 9/7 DWT + uniform
    scalar quantization + adaptive arithmetic bitplane coding
    (reference: compression/src/compression.cpp ``compressCUDA*`` over
    the vendored cudaCompress DWT/quantizer/coder -- this is the same
    three-stage pipeline built from scratch; the K-normalized lifting
    makes the transform near-orthonormal, so one global ``step``
    controls distortion across levels). Requires even dimensions
    divisible by 2^levels."""
    v = np.asarray(volume, np.float32)
    if tracker:
        tracker.alloc(v.nbytes)
    levels = int(levels)
    for sdim in v.shape:
        if sdim % (1 << levels):
            raise ValueError(
                f"dims {v.shape} not divisible by 2^{levels}")
    coeffs = _dwt3(v, levels)
    q = np.round(coeffs.ravel() / step)
    sign = (q < 0)
    mag = np.abs(q).astype(np.uint64)
    nbits = max(1, int(mag.max()).bit_length())
    from . import arith
    if arith.available():
        entropy = "ac"
        payload_c = arith.encode_planes(mag, sign.astype(np.uint8),
                                        nbits)
    else:
        entropy = "lz4"
        payload_c = lz4io.compress(
            q.astype(np.int32).tobytes()) if lz4io.available() \
            else q.astype(np.int32).tobytes()
    blob = {"shape": v.shape, "levels": levels, "step": float(step),
            "nbits": nbits, "entropy": entropy, "coeffs": payload_c}
    raw = pickle.dumps(blob)
    data = struct.pack("<i", len(raw)) + raw
    rec = decompress_dwt(data)
    if tracker:
        tracker.free(v.nbytes)
    return CompressionResult(payload=data, compressed_bytes=len(data),
                             raw_bytes=v.nbytes, psnr=_psnr(v, rec))


def decompress_dwt(data: bytes) -> np.ndarray:
    (raw_len,) = struct.unpack("<i", data[:4])
    blob = pickle.loads(data[4:4 + raw_len])
    shape = blob["shape"]
    n = int(np.prod(shape))
    if blob["entropy"] == "ac":
        from . import arith
        mag, sg = arith.decode_planes(blob["coeffs"], n, blob["nbits"])
        q = mag.astype(np.float64) * np.where(sg.astype(bool), -1.0, 1.0)
    else:
        raw = lz4io.decompress(blob["coeffs"], n * 4) \
            if lz4io.available() else blob["coeffs"]
        q = np.frombuffer(raw, np.int32).astype(np.float64)
    coeffs = (q * blob["step"]).reshape(shape)
    return _idwt3(coeffs, blob["levels"]).astype(np.float32)


def compression_teaser(volume: np.ndarray, network_bytes: int) -> dict:
    """Size-matched comparison table
    (reference: eval_CompressionTeaser.py:169-241): tune each codec to
    roughly the SRN's byte budget, report ratio + PSNR."""
    results = {}
    for eps in (3e-2, 1e-2, 3e-3):
        r = compress_tthresh(volume, eps)
        results[f"tthresh@{eps:g}"] = {
            "bytes": r.compressed_bytes, "ratio": r.ratio, "psnr": r.psnr}
    for energy in (1e-2, 1e-3, 1e-4):
        r = compress_tucker(volume, energy)
        results[f"tucker@{energy:g}"] = {
            "bytes": r.compressed_bytes, "ratio": r.ratio, "psnr": r.psnr}
    for bits in (4, 8):
        r = compress_quantize(volume, bits)
        results[f"quantize@{bits}bit"] = {
            "bytes": r.compressed_bytes, "ratio": r.ratio, "psnr": r.psnr}
    if all(s % 8 == 0 for s in volume.shape):
        for step in (1e-2, 3e-3, 1e-3):
            r = compress_dwt(volume, step)
            results[f"dwt@{step:g}"] = {
                "bytes": r.compressed_bytes, "ratio": r.ratio,
                "psnr": r.psnr}
    results["network"] = {"bytes": network_bytes,
                          "ratio": volume.nbytes / max(network_bytes, 1)}
    return results


def compress_dwt_chunked(volume: np.ndarray, step: float = 3e-3,
                         brick: int = 64, levels: int = 3,
                         tracker: MemoryTracker | None = None
                         ) -> CompressionResult:
    """Chunked (per-brick) DWT codec -- the cudaCompress INTERACTIVE
    decompression structure (reference: compression/src/compression.cpp
    :821 area + compression_cu.cu: the GPU codec compresses bricks
    independently so the renderer can decompress only the bricks a view
    touches, streaming into mipmap surfaces). Each ``brick``^3 block is
    an independent :func:`compress_dwt` payload addressable by
    :func:`decompress_dwt_brick` without touching the rest."""
    v = np.asarray(volume, np.float32)
    if tracker:
        tracker.alloc(v.nbytes)
    for sdim in v.shape:
        if sdim % brick:
            raise ValueError(f"dims {v.shape} not divisible by "
                             f"brick={brick}")
    nb = tuple(sdim // brick for sdim in v.shape)
    payloads = []
    for bx in range(nb[0]):
        for by in range(nb[1]):
            for bz in range(nb[2]):
                blk = v[bx * brick:(bx + 1) * brick,
                        by * brick:(by + 1) * brick,
                        bz * brick:(bz + 1) * brick]
                r = compress_dwt(blk, step=step, levels=levels)
                payloads.append(r.payload)
    index = np.cumsum([0] + [len(p) for p in payloads]).astype(np.int64)
    head = struct.pack("<4i", brick, *nb)
    head += index.tobytes()
    data = head + b"".join(payloads)
    rec = decompress_dwt_chunked(data)
    if tracker:
        tracker.free(v.nbytes)
    return CompressionResult(payload=data, compressed_bytes=len(data),
                             raw_bytes=v.nbytes, psnr=_psnr(v, rec))


def _dwt_chunk_header(data: bytes):
    brick, nx, ny, nz = struct.unpack("<4i", data[:16])
    n = nx * ny * nz
    index = np.frombuffer(data[16:16 + 8 * (n + 1)], np.int64)
    body = data[16 + 8 * (n + 1):]
    return brick, (nx, ny, nz), index, body


def decompress_dwt_brick(data: bytes, bx: int, by: int, bz: int
                         ) -> np.ndarray:
    """Decode ONE brick of a chunked payload (interactive
    decompression: cost is proportional to the brick, not the
    volume)."""
    brick, nb, index, body = _dwt_chunk_header(data)
    i = (bx * nb[1] + by) * nb[2] + bz
    return decompress_dwt(body[index[i]:index[i + 1]])


def decompress_dwt_chunked(data: bytes) -> np.ndarray:
    brick, nb, index, body = _dwt_chunk_header(data)
    out = np.empty((nb[0] * brick, nb[1] * brick, nb[2] * brick),
                   np.float32)
    i = 0
    for bx in range(nb[0]):
        for by in range(nb[1]):
            for bz in range(nb[2]):
                out[bx * brick:(bx + 1) * brick,
                    by * brick:(by + 1) * brick,
                    bz * brick:(bz + 1) * brick] = \
                    decompress_dwt(body[index[i]:index[i + 1]])
                i += 1
    return out
