"""`.volnet` binary export/import of scene networks.

Rebuild of the reference's deployment format
(reference: renderer/volume_interpolation_network.cpp: InputParametrization
v3 :68-134, OutputParametrization v1 :203-221, Layer v2 :248-290,
LatentGrid v1 :564-614, LatentGridTimeAndEnsemble v1 :755-800,
SceneNetwork v2 :1059-1105). Field-for-field compatible little-endian
layout; weights are stored as fp16 like the tensor-core path. Latent grids
are written with FLOAT encoding and (C, Z, Y, X) contiguous layout; the
byte-quantized encodings (BYTE_LINEAR/BYTE_GAUSSIAN, reference
volume_interpolation_network.h:180-194) are supported on read/write via
per-channel offset/scale.
"""
from __future__ import annotations

import io
import struct
from typing import Optional

import numpy as np

from ..utils.pytree import struct as _struct  # noqa: F401 (doc parity)
from .latent import LatentSpace
from .srn import InputParametrization, Layer, SceneRepresentationNetwork

_INPUT_VERSION = 3
_OUTPUT_VERSION = 1
_LAYER_VERSION = 2
_GRID_VERSION = 1
_TIME_ENSEMBLE_VERSION = 1
_NETWORK_VERSION = 2

ENCODING_FLOAT = 0
ENCODING_BYTE_LINEAR = 1
ENCODING_BYTE_GAUSSIAN = 2

_ACTIVATION_NAMES = ("ReLU", "Sine", "Snake", "SnakeAlt", "Sigmoid",
                     "None")
_OUTPUT_MODES = ("density", "density:direct", "rgbo", "rgbo:direct",
                 "rgbo:exp")


def _write_string(out, s: str):
    b = s.encode()
    out.write(struct.pack("<i", len(b)))
    out.write(b)


def _read_string(inp) -> str:
    n, = struct.unpack("<i", inp.read(4))
    return inp.read(n).decode()


def save_volnet(net: SceneRepresentationNetwork, path_or_stream,
                box_min=(-0.5, -0.5, -0.5), box_size=(1.0, 1.0, 1.0),
                grid_encoding: int = ENCODING_FLOAT):
    """Serialize to the `.volnet` format
    (reference: SceneNetwork::save, volume_interpolation_network.cpp:
    1088-1105)."""
    own = isinstance(path_or_stream, str)
    out = open(path_or_stream, "wb") if own else path_or_stream
    try:
        out.write(struct.pack("<i", _NETWORK_VERSION))
        _save_input(net.input, out)
        _save_output(net.output_mode, out)
        out.write(struct.pack("<i", len(net.layers)))
        for layer in net.layers:
            _save_layer(layer, out)
        out.write(struct.pack("<3f", *box_min))
        out.write(struct.pack("<3f", *box_size))
        latent = net.latent
        has_grid = (latent.static_grid is not None
                    or latent.time_grid is not None
                    or latent.ensemble_grid is not None)
        out.write(b"\x01" if has_grid else b"\x00")
        if has_grid:
            _save_time_ensemble(latent, out, grid_encoding)
    finally:
        if own:
            out.close()


def load_volnet(path_or_stream) -> tuple[SceneRepresentationNetwork,
                                         np.ndarray, np.ndarray]:
    """Returns (network, box_min, box_size)."""
    own = isinstance(path_or_stream, str)
    inp = open(path_or_stream, "rb") if own else path_or_stream
    try:
        version, = struct.unpack("<i", inp.read(4))
        if version > _NETWORK_VERSION:
            raise ValueError(f"unknown SceneNetwork version {version}")
        input_param = _load_input(inp)
        output_mode = _load_output(inp)
        num_layers, = struct.unpack("<i", inp.read(4))
        layers = tuple(_load_layer(inp) for _ in range(num_layers))
        box_min = np.asarray(struct.unpack("<3f", inp.read(12)),
                             np.float32)
        box_size = np.asarray(struct.unpack("<3f", inp.read(12)),
                              np.float32)
        latent = LatentSpace()
        if version >= 2:
            has_grid = inp.read(1) != b"\x00"
            if has_grid:
                latent = _load_time_ensemble(inp)
        net = SceneRepresentationNetwork(
            input=input_param, layers=layers, latent=latent,
            output_mode=output_mode)
        return net, box_min, box_size
    finally:
        if own:
            inp.close()


# --------------------------------------------------------------------- #

def _save_input(p: InputParametrization, out):
    out.write(struct.pack("<i", _INPUT_VERSION))
    out.write(struct.pack("<?", False))  # hasTime (grid-driven time only)
    out.write(struct.pack("<?", p.has_direction))
    f = 0 if p.fourier_matrix is None else p.fourier_matrix.shape[0]
    out.write(struct.pack("<i", f))
    use_dir_fourier = (p.fourier_matrix is not None
                       and p.fourier_matrix.shape[1] == 6)
    out.write(struct.pack("<?", use_dir_fourier))
    if f > 0:
        m = np.asarray(p.fourier_matrix, np.float16)
        out.write(m.tobytes())


def _load_input(inp) -> InputParametrization:
    version, = struct.unpack("<i", inp.read(4))
    if version != _INPUT_VERSION:
        raise ValueError(
            f"only InputParametrization v{_INPUT_VERSION} supported, "
            f"got {version}")
    _has_time, = struct.unpack("<?", inp.read(1))
    has_direction, = struct.unpack("<?", inp.read(1))
    f, = struct.unpack("<i", inp.read(4))
    use_dir_fourier, = struct.unpack("<?", inp.read(1))
    c = 6 if use_dir_fourier else 3
    matrix = None
    if f > 0:
        matrix = np.frombuffer(inp.read(2 * f * c),
                               np.float16).reshape(f, c)
        matrix = matrix.astype(np.float32)
    return InputParametrization(
        fourier_matrix=matrix, fourier_matrix_time=None,
        has_direction=has_direction,
        disable_direction_in_fourier=not use_dir_fourier,
        use_time_direct=False)


def _save_output(mode: str, out):
    out.write(struct.pack("<i", _OUTPUT_VERSION))
    _write_string(out, mode)


def _load_output(inp) -> str:
    version, = struct.unpack("<i", inp.read(4))
    if version != _OUTPUT_VERSION:
        raise ValueError(f"unknown OutputParametrization v{version}")
    mode = _read_string(inp)
    if mode not in _OUTPUT_MODES:
        raise ValueError(f"unknown output mode {mode}")
    return mode


def _save_layer(layer: Layer, out):
    out.write(struct.pack("<i", _LAYER_VERSION))
    w = np.asarray(layer.weight, np.float16)  # (out, in)
    b = np.asarray(layer.bias, np.float16)
    rows, cols = w.shape
    out.write(struct.pack("<ii", rows, cols))
    out.write(w.tobytes())
    out.write(b.tobytes())
    name = layer.activation if layer.activation in _ACTIVATION_NAMES \
        else "None"
    _write_string(out, name)
    out.write(struct.pack("<f", layer.activation_param))


def _load_layer(inp) -> Layer:
    version, = struct.unpack("<i", inp.read(4))
    if version not in (1, 2):
        raise ValueError(f"unknown Layer version {version}")
    rows, cols = struct.unpack("<ii", inp.read(8))
    w = np.frombuffer(inp.read(2 * rows * cols),
                      np.float16).reshape(rows, cols).astype(np.float32)
    b = np.frombuffer(inp.read(2 * rows),
                      np.float16).astype(np.float32)
    act = _read_string(inp)
    param = 1.0
    if version == 2:
        param, = struct.unpack("<f", inp.read(4))
    return Layer(weight=w, bias=b, activation=act,
                 activation_param=param)


def _encode_grid(grid: np.ndarray, encoding: int):
    """grid (C, Z, Y, X) float -> (payload bytes, offset, scale)."""
    c = grid.shape[0]
    if encoding == ENCODING_FLOAT:
        return grid.astype(np.float32).tobytes(), None, None
    flat = grid.reshape(c, -1)
    if encoding == ENCODING_BYTE_LINEAR:
        lo = flat.min(axis=1)
        hi = flat.max(axis=1)
        scale = np.where(hi > lo, hi - lo, 1.0)
        q = np.clip((flat - lo[:, None]) / scale[:, None], 0, 1)
        payload = np.round(q * 255).astype(np.uint8).tobytes()
        return payload, lo.astype(np.float32), scale.astype(np.float32)
    if encoding == ENCODING_BYTE_GAUSSIAN:
        # gaussian CDF quantization (reference: LatentGrid encoding
        # BYTE_GAUSSIAN): mean/std per channel, byte = cdf((x-mu)/std)
        mu = flat.mean(axis=1)
        std = np.maximum(flat.std(axis=1), 1e-8)
        z = (flat - mu[:, None]) / std[:, None]
        from scipy.stats import norm
        q = norm.cdf(z)
        payload = np.clip(np.round(q * 255), 0, 255).astype(
            np.uint8).tobytes()
        return payload, mu.astype(np.float32), std.astype(np.float32)
    raise ValueError(f"unknown encoding {encoding}")


def _decode_grid(payload: bytes, encoding: int, shape,
                 offset, scale) -> np.ndarray:
    c, z, y, x = shape
    if encoding == ENCODING_FLOAT:
        return np.frombuffer(payload, np.float32).reshape(shape).copy()
    q = np.frombuffer(payload, np.uint8).reshape(c, -1) / 255.0
    if encoding == ENCODING_BYTE_LINEAR:
        flat = q * scale[:, None] + offset[:, None]
    elif encoding == ENCODING_BYTE_GAUSSIAN:
        from scipy.stats import norm
        flat = norm.ppf(np.clip(q, 1e-6, 1 - 1e-6)) * scale[:, None] \
            + offset[:, None]
    else:
        raise ValueError(f"unknown encoding {encoding}")
    return flat.reshape(shape).astype(np.float32)


def _save_latent_grid(grid: np.ndarray, out, encoding: int):
    """grid (C, Z, Y, X) (reference: LatentGrid::save)."""
    out.write(struct.pack("<i", _GRID_VERSION))
    out.write(struct.pack("<i", encoding))
    c, z, y, x = grid.shape
    out.write(struct.pack("<4i", c, z, y, x))
    payload, offset, scale = _encode_grid(np.asarray(grid, np.float32),
                                          encoding)
    out.write(payload)
    if encoding != ENCODING_FLOAT:
        out.write(offset.tobytes())
        out.write(scale.tobytes())


def _load_latent_grid(inp) -> np.ndarray:
    version, = struct.unpack("<i", inp.read(4))
    if version != _GRID_VERSION:
        raise ValueError(f"unknown LatentGrid version {version}")
    encoding, = struct.unpack("<i", inp.read(4))
    c, z, y, x = struct.unpack("<4i", inp.read(16))
    bpe = 4 if encoding == ENCODING_FLOAT else 1
    payload = inp.read(bpe * c * z * y * x)
    offset = scale = None
    if encoding != ENCODING_FLOAT:
        offset = np.frombuffer(inp.read(4 * c), np.float32)
        scale = np.frombuffer(inp.read(4 * c), np.float32)
    return _decode_grid(payload, encoding, (c, z, y, x), offset, scale)


def _save_time_ensemble(latent: LatentSpace, out, encoding: int):
    """(reference: LatentGridTimeAndEnsemble::save). A static grid is
    stored as one time keyframe (reference: network.py:861-868)."""
    out.write(struct.pack("<i", _TIME_ENSEMBLE_VERSION))
    if latent.time_dependent:
        time_grids = ([np.asarray(g) for g in latent.time_grid]
                      if latent.time_grid is not None else [])
        ens_grids = ([np.asarray(g) for g in latent.ensemble_grid]
                     if latent.ensemble_grid is not None else [])
    else:
        time_grids = [np.asarray(latent.static_grid)] \
            if latent.static_grid is not None else []
        ens_grids = []
    out.write(struct.pack("<5i", 0, len(time_grids), 1, 0,
                          len(ens_grids)))
    for g in time_grids:
        _save_latent_grid(g, out, encoding)
    for g in ens_grids:
        _save_latent_grid(g, out, encoding)


def _load_time_ensemble(inp) -> LatentSpace:
    version, = struct.unpack("<i", inp.read(4))
    if version > _TIME_ENSEMBLE_VERSION:
        raise ValueError(f"unknown LatentGridTimeAndEnsemble v{version}")
    _tmin, tnum, _tstep, _emin, enum_ = struct.unpack("<5i", inp.read(20))
    time_grids = [_load_latent_grid(inp) for _ in range(tnum)]
    ens_grids = [_load_latent_grid(inp) for _ in range(enum_)]
    if tnum == 1 and enum_ == 0:
        return LatentSpace(static_grid=time_grids[0])
    return LatentSpace(
        time_grid=np.stack(time_grids) if time_grids else None,
        ensemble_grid=np.stack(ens_grids) if ens_grids else None,
        time_dependent=True)
