"""Scene representation network (SRN).

TPU-native rebuild of ``SceneRepresentationNetwork``
(reference: applications/volnet/network.py:653-1096) and of the host-side
network spec ``SceneNetwork`` (reference: renderer/
volume_interpolation_network.h:450-603): fourier input parametrization,
hidden MLP with the reference's activation zoo, output parametrizations, and
latent conditioning (vectors + volumetric grids).

The network is a pytree whose leaves are parameters; the same object drives
- plain-JAX evaluation (training oracle, this file),
- the fused Pallas DVR+MLP kernel (fvsrn_tpu/ops), which reads the identical
  weight pytree, mirroring how the reference shares weights between the
  PyTorch model and the tensor-core renderer via export_to_pyrenderer
  (reference: network.py:798-897).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct
from .activations import apply_activation, parse_activation
from .latent import LatentSpace

OUTPUT_MODES = ("density", "density:direct", "rgbo", "rgbo:direct",
                "rgbo:exp")


@struct
class InputParametrization:
    """Fourier-feature input encoding
    (reference: network.py:19-169 ``InputParametrization``).

    ``fourier_matrix`` is (F, 3) or (F, 6) (with direction), premultiplied
    by 2*pi (PREMULTIPLY_2_PI semantics, network.py:20-23). Output layout
    matches the reference: [base inputs, cos(Bx), sin(Bx),
    cos(Bt t), sin(Bt t), extra latent channels].
    """
    fourier_matrix: Optional[Array] = None       # (F, 3|6) premultiplied
    fourier_matrix_time: Optional[Array] = None  # (Ft, 1) premultiplied
    has_direction: bool = static_field(default=False)
    disable_direction_in_fourier: bool = static_field(default=True)
    use_time_direct: bool = static_field(default=False)

    @classmethod
    def make(cls, num_fourier: int = 0, fourier_std: float = 1.0,
             has_direction: bool = False,
             disable_direction_in_fourier: bool = True,
             fourier_position_direction_split: int = -1,
             use_time_direct: bool = False, num_time_fourier: int = 0,
             seed: int = 42):
        """Gaussian (fourier_std > 0) or NeRF block-identity (fourier_std <= 0)
        fourier matrix (reference: network.py:42-82)."""
        rng = np.random.default_rng(seed)
        out = 6 if (has_direction and not disable_direction_in_fourier) else 3
        num_pos = num_fourier - num_time_fourier if num_time_fourier > 0 \
            else num_fourier
        B = None
        B_time = None
        if num_fourier > 0:
            if fourier_std > 0:
                B = rng.normal(0.0, fourier_std, (num_pos, out))
                B = B * (2 * np.pi)
            else:
                if fourier_position_direction_split >= 0:
                    raise ValueError(
                        "fourier-split not compatible with NeRF matrix")
                num_blocks = int(np.ceil(num_pos / out))
                Bx = [2.0 ** i * np.eye(out) for i in range(num_blocks)]
                B = np.concatenate(Bx, axis=0)[:num_pos] * (2 * np.pi)
            if fourier_position_direction_split >= 0:
                assert has_direction and not disable_direction_in_fourier
                B[:fourier_position_direction_split, 3:] = 0
                B[fourier_position_direction_split:, :3] = 0
            B = B.astype(np.float32)
            if num_time_fourier > 0:
                if fourier_std > 0:
                    B_time = rng.normal(0.0, fourier_std,
                                        (num_time_fourier, 1))
                else:
                    B_time = np.asarray(
                        [[2 ** i] for i in range(num_time_fourier)])
                B_time = (B_time * (2 * np.pi)).astype(np.float32)
        return cls(fourier_matrix=B, fourier_matrix_time=B_time,
                   has_direction=has_direction,
                   disable_direction_in_fourier=disable_direction_in_fourier,
                   use_time_direct=use_time_direct)

    @property
    def num_fourier(self) -> int:
        f = 0
        if self.fourier_matrix is not None:
            f += self.fourier_matrix.shape[0]
        if self.fourier_matrix_time is not None:
            f += self.fourier_matrix_time.shape[0]
        return f

    def has_time(self) -> bool:
        return self.use_time_direct or self.fourier_matrix_time is not None

    def num_input_channels(self) -> int:
        return (3 + (3 if self.has_direction else 0)
                + (1 if self.has_time() else 0))

    def num_direct_output_channels(self) -> int:
        return (3 + (3 if self.has_direction else 0)
                + (1 if self.use_time_direct else 0))

    def num_output_channels(self) -> int:
        return self.num_direct_output_channels() + 2 * self.num_fourier

    def __call__(self, x: Array) -> Array:
        """(N, Cin + extra) -> (N, Cout + extra); extra channels (latent
        features) pass through at the end (reference: network.py:124-169)."""
        n_in = self.num_input_channels()
        x_base = x[:, :self.num_direct_output_channels()]
        x_extra = x[:, n_in:]
        parts = [x_base]
        if self.fourier_matrix is not None:
            n_f = self.fourier_matrix.shape[1]
            f = x[:, :n_f] @ self.fourier_matrix.T
            parts.append(jnp.cos(f))
            parts.append(jnp.sin(f))
        if self.fourier_matrix_time is not None:
            t = x[:, 3:4]
            ft = t @ self.fourier_matrix_time.T
            parts.append(jnp.cos(ft))
            parts.append(jnp.sin(ft))
        parts.append(x_extra)
        return jnp.concatenate(parts, axis=1)


@struct
class Layer:
    """One linear layer; torch ``nn.Linear`` conventions: weight (out, in)
    (reference: volume_interpolation_network.h:120-165)."""
    weight: Array
    bias: Array
    activation: str = static_field(default="None")
    activation_param: float = static_field(default=1.0)

    def __call__(self, x: Array) -> Array:
        y = x @ self.weight.T + self.bias
        return apply_activation(self.activation, y, self.activation_param)


def _apply_output(mode: str, x: Array, eval_mode: str) -> Array:
    """Output parametrization (reference: network.py:171-237)."""
    if mode == "density":
        return jax.nn.sigmoid(x)
    if mode == "density:direct":
        return jnp.clip(x, 0.0, 1.0) if eval_mode == "screen" else x
    rgb = x[..., :3]
    absorption = x[..., 3:]
    if mode == "rgbo":
        rgb = jax.nn.sigmoid(rgb)
        absorption = jax.nn.softplus(absorption)
    elif mode == "rgbo:direct":
        if eval_mode == "screen":
            rgb = jnp.clip(rgb, 0.0, 1.0)
            absorption = jnp.maximum(absorption, 0.0)
    elif mode == "rgbo:exp":
        rgb = jax.nn.sigmoid(rgb)
        absorption = jnp.exp(absorption)
    else:
        raise ValueError(f"unknown output mode {mode}")
    return jnp.concatenate([rgb, absorption], axis=-1)


@struct
class SceneRepresentationNetwork:
    input: InputParametrization
    layers: tuple[Layer, ...]
    latent: LatentSpace
    output_mode: str = static_field(default="density")

    @classmethod
    def make(cls, *, layers: str = "32:32:32", activation: str = "SnakeAlt:2",
             output_mode: str = "density", num_fourier: int = 14,
             fourier_std: float = 1.0, use_direction: bool = False,
             disable_direction_in_fourier: bool = True,
             fourier_position_direction_split: int = -1,
             use_time_direct: bool = False, num_time_fourier: int = 0,
             latent: Optional[LatentSpace] = None,
             seed: int = 42) -> "SceneRepresentationNetwork":
        """Build with the reference's argparse-equivalent options and torch
        Linear default init (reference: network.py:345-413 InnerNetwork)."""
        if output_mode not in OUTPUT_MODES:
            raise ValueError(f"output_mode must be one of {OUTPUT_MODES}")
        latent = latent if latent is not None else LatentSpace()
        inp = InputParametrization.make(
            num_fourier=num_fourier, fourier_std=fourier_std,
            has_direction=use_direction,
            disable_direction_in_fourier=disable_direction_in_fourier,
            fourier_position_direction_split=fourier_position_direction_split,
            use_time_direct=use_time_direct,
            num_time_fourier=num_time_fourier, seed=seed)
        act_name, act_param = parse_activation(activation)
        sizes = [int(s) for s in layers.split(":")]
        out_channels = 1 if output_mode.startswith("density") else 4
        in_ch = inp.num_output_channels() + latent.total_channels

        rng = np.random.default_rng(seed + 1)
        layer_list = []
        last = in_ch
        for s in sizes:
            bound = 1.0 / math.sqrt(last)
            w = rng.uniform(-bound, bound, (s, last)).astype(np.float32)
            b = rng.uniform(-bound, bound, (s,)).astype(np.float32)
            layer_list.append(Layer(weight=w, bias=b, activation=act_name,
                                    activation_param=act_param))
            last = s
        bound = 1.0 / math.sqrt(last)
        w = rng.uniform(-bound, bound, (out_channels, last)).astype(np.float32)
        b = rng.uniform(-bound, bound, (out_channels,)).astype(np.float32)
        if out_channels == 4:
            # positive initial output so something is visible
            # (reference: network.py:404-405)
            b = np.abs(b) + 1.0
        layer_list.append(Layer(weight=w, bias=b, activation="None"))
        return cls(input=inp, layers=tuple(layer_list), latent=latent,
                   output_mode=output_mode)

    @property
    def use_direction(self) -> bool:
        return self.input.has_direction

    def output_channels(self) -> int:
        return 1 if self.output_mode.startswith("density") else 4

    def hidden_sizes(self) -> tuple[int, ...]:
        return tuple(l.weight.shape[0] for l in self.layers[:-1])

    def __call__(self, x: Array, tf: Optional[Array] = None,
                 time: Optional[Array] = None,
                 ensemble: Optional[Array] = None,
                 mode: str = "screen") -> Array:
        """x (N, 3) positions in [0,1]^3, or (N, 6) with direction.
        tf/time/ensemble: (N,) conditioning (reference: network.py:998-1096
        ``forward``). Returns (N, output_channels)."""
        assert mode in ("screen", "world")
        n = x.shape[0]
        dtype = x.dtype
        if time is None:
            time = jnp.zeros((n,), dtype)
        if ensemble is None:
            ensemble = jnp.zeros((n,), dtype)

        parts = [x]
        if self.input.has_time():
            parts.append(jnp.reshape(time, (n, 1)))
        feats = self.latent.evaluate(x[:, :3], time, ensemble)
        y = jnp.concatenate(parts + feats, axis=1)
        y = self.input(y)
        for layer in self.layers:
            y = layer(y)
        return _apply_output(self.output_mode, y, mode)
