"""Volume compression baselines.

Rebuild of the reference's compression tower
(reference: compression/src/compression.cpp:1-821 TThresh + cudaCompress
wrappers exposed as ``pyrenderer.compression``, bindings.cpp:285-606, with
allocation tracking in memtrace.cpp): the baselines the SRN is compared
against (reference: applications/volnet/eval_CompressionTeaser.py).

Provided codecs (from scratch, no vendored coders):
- ``tucker``: HOSVD/Tucker decomposition with energy-threshold rank
  truncation -- the mathematical core of TThresh (Ballester-Ripoll et al.)
  -- plus fp16 factor storage and native-LZ4 entropy coding.
- ``quantize``: uniform scalar quantization to b bits + LZ4 (the shape of
  the cudaCompress DWT/quantization pipeline without the DWT).

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

    Deviation from the paper (documented): the surviving planes are
    entropy-coded with the repo's from-scratch LZ4 over the packed
    integer/sign arrays instead of the paper's adaptive arithmetic
    coder with RLE -- simpler backend, same progressive-bitplane rate
    behavior; factors are stored f16 like the reference's float mode.
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
    # store the surviving planes as PACKED BITPLANES, MSB first (the
    # paper's layout): high planes are almost entirely zero, so the LZ4
    # stage collapses them -- the fixed-width spelling wasted ~2-3x
    nz = kept != 0
    planes = [np.packbits(((kept >> np.uint64(p)) & np.uint64(1))
                          .astype(np.uint8)).tobytes()
              for p in range(nbits - 1, -1, -1)]
    coeff_raw = b"".join(planes)
    sign_raw = np.packbits(sign[nz].astype(np.uint8)).tobytes()
    blob = {
        "shape": v.shape,
        "cut": cut,
        "amax": amax,
        "nbits": nbits,
        "coeffs": coeff_raw,
        "signs": sign_raw,
        "n_nz": int(nz.sum()),
        "factors": [f.astype(np.float16) for f in factors],
    }
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
    plane_bytes = -(-n // 8)
    kept = np.zeros(n, np.uint64)
    buf = blob["coeffs"]
    for k in range(nbits):
        p = nbits - 1 - k
        bits = np.unpackbits(np.frombuffer(
            buf[k * plane_bytes:(k + 1) * plane_bytes], np.uint8))[:n]
        kept |= bits.astype(np.uint64) << np.uint64(p)
    mag = (kept << np.uint64(blob["cut"])).astype(np.float64) \
        * (blob["amax"] / float(2 ** 62))
    nz = kept != 0
    signs = np.unpackbits(
        np.frombuffer(blob["signs"], np.uint8))[:blob["n_nz"]]
    sgn = np.ones(n, np.float64)
    sgn[nz] = np.where(signs.astype(bool), -1.0, 1.0)
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
    results["network"] = {"bytes": network_bytes,
                          "ratio": volume.nbytes / max(network_bytes, 1)}
    return results
