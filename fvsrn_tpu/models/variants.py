"""SRN architecture variants: ResidualSine and ModulatedSine.

Rebuild of the reference's special inner networks
(reference: applications/volnet/network.py):
- ``ResidualSineLayer`` (:306-340, after Lu & Berger 2021 "Compressive
  Neural Representations of Volumetric Scalar Fields"): residual blocks
  sin(w0 Wx) with 0.5 averaging on designated blocks and SIREN-style
  initialization.
- ``ModulatedSine`` (:263-297, after Mehta et al. "Modulated Periodic
  Activations"): a synthesizer branch with sine activations whose hidden
  states are gated by a ReLU modulator branch driven by the latent code.

Both expose the ``SceneRepresentationNetwork`` call signature so they can
drive ``VolumeInterpolationNetwork`` and the training loops unchanged.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct
from .latent import LatentSpace, interp1d
from .srn import InputParametrization, _apply_output


@struct
class ResidualSineNetwork:
    """first linear + Sine(w0), then residual sine blocks, linear out
    (reference: network.py:306-340, :371-394)."""
    input: InputParametrization
    first_w: Array
    first_b: Array
    blocks: tuple   # tuple of (w1, b1, w2, b2)
    out_w: Array
    out_b: Array
    block_weights: tuple = static_field(default=())  # (ave_first, ave_second) pairs
    omega0: float = static_field(default=30.0)
    output_mode: str = static_field(default="density")

    @classmethod
    def make(cls, *, hidden: int = 32, num_blocks: int = 3,
             num_fourier: int = 0, output_mode: str = "density",
             omega0: float = 30.0, seed: int = 42):
        rng = np.random.default_rng(seed)
        inp = InputParametrization.make(num_fourier=num_fourier,
                                        seed=seed)
        in_ch = inp.num_output_channels()
        out_ch = 1 if output_mode.startswith("density") else 4
        # SIREN first-layer init (reference: network.py:380-383)
        fw = rng.uniform(-1.0 / in_ch, 1.0 / in_ch,
                         (hidden, in_ch)).astype(np.float32)
        fb = np.zeros(hidden, np.float32)
        bound = math.sqrt(6 / hidden) / omega0
        blocks = []
        weights = []
        for i in range(num_blocks):
            w1 = rng.uniform(-bound, bound,
                             (hidden, hidden)).astype(np.float32)
            w2 = rng.uniform(-bound, bound,
                             (hidden, hidden)).astype(np.float32)
            blocks.append((w1, np.zeros(hidden, np.float32),
                           w2, np.zeros(hidden, np.float32)))
            # reference: ave_first = i > 1(with i starting at 1),
            # ave_second on the second-to-last block
            weights.append((0.5 if i > 0 else 1.0,
                            0.5 if i == num_blocks - 2 else 1.0))
        ow = rng.uniform(-bound, bound,
                         (out_ch, hidden)).astype(np.float32)
        ob = np.zeros(out_ch, np.float32)
        return cls(input=inp, first_w=fw, first_b=fb,
                   blocks=tuple(blocks), out_w=ow, out_b=ob,
                   block_weights=tuple(weights), omega0=omega0,
                   output_mode=output_mode)

    def __call__(self, x: Array, tf=None, time=None, ensemble=None,
                 mode: str = "screen") -> Array:
        y = self.input(x)
        h = jnp.sin(self.omega0 * (y @ self.first_w.T + self.first_b))
        for (w1, b1, w2, b2), (a1, a2) in zip(self.blocks,
                                              self.block_weights):
            s1 = jnp.sin(self.omega0 * ((a1 * h) @ w1.T + b1))
            s2 = jnp.sin(self.omega0 * (s1 @ w2.T + b2))
            h = a2 * (h + s2)
        out = h @ self.out_w.T + self.out_b
        return _apply_output(self.output_mode, out, mode)


@struct
class ModulatedSineNetwork:
    """Synthesizer (sine) gated by a latent-driven modulator (ReLU)
    (reference: network.py:263-297 CustomActivations.ModulatedSine +
    InnerNetwork special handling :351-360)."""
    input: InputParametrization
    latent: LatentSpace
    syn_layers: tuple   # tuple of (w, b)
    mod_layers: tuple   # tuple of (w, b)
    out_w: Array
    out_b: Array
    w0: float = static_field(default=30.0)
    output_mode: str = static_field(default="density")

    @classmethod
    def make(cls, *, hidden: int = 32, num_layers: int = 3,
             num_fourier: int = 0, latent: LatentSpace = None,
             w0: float = 30.0, output_mode: str = "density",
             seed: int = 42):
        latent = latent if latent is not None else LatentSpace()
        z_dim = latent.total_channels
        if z_dim == 0:
            raise ValueError("ModulatedSine needs a latent code")
        rng = np.random.default_rng(seed)
        inp = InputParametrization.make(num_fourier=num_fourier,
                                        seed=seed)
        in_ch = inp.num_output_channels()
        out_ch = 1 if output_mode.startswith("density") else 4
        # reference halves the layer size so parameter counts match the
        # plain network (network.py:352-355)
        h = hidden // 2
        syn, mod = [], []
        last_i, last_m = in_ch, z_dim
        for i in range(num_layers):
            bi = 1.0 / math.sqrt(last_i)
            syn.append((rng.uniform(-bi, bi, (h, last_i))
                        .astype(np.float32),
                        rng.uniform(-bi, bi, (h,)).astype(np.float32)))
            bm = 1.0 / math.sqrt(last_m)
            mod.append((rng.uniform(-bm, bm, (h, last_m))
                        .astype(np.float32),
                        rng.uniform(-bm, bm, (h,)).astype(np.float32)))
            last_i = h
            last_m = h + z_dim  # modulator re-ingests the latent
        bo = 1.0 / math.sqrt(h)
        ow = rng.uniform(-bo, bo, (out_ch, h)).astype(np.float32)
        ob = rng.uniform(-bo, bo, (out_ch,)).astype(np.float32)
        return cls(input=inp, latent=latent, syn_layers=tuple(syn),
                   mod_layers=tuple(mod), out_w=ow, out_b=ob, w0=w0,
                   output_mode=output_mode)

    def _z(self, time, ensemble) -> Array:
        parts = []
        if self.latent.ensemble_vector is not None:
            v = interp1d(self.latent.ensemble_vector,
                         jnp.reshape(ensemble, (1, 1)))
            parts.append(v[0, :, 0])
        if self.latent.time_vector is not None:
            v = interp1d(self.latent.time_vector,
                         jnp.reshape(time, (1, 1)))
            parts.append(v[0, :, 0])
        return jnp.concatenate(parts)

    def __call__(self, x: Array, tf=None, time=None, ensemble=None,
                 mode: str = "screen") -> Array:
        n = x.shape[0]
        t = jnp.zeros(()) if time is None else jnp.reshape(time, (-1,))[0]
        e = jnp.zeros(()) if ensemble is None \
            else jnp.reshape(ensemble, (-1,))[0]
        z = jnp.broadcast_to(self._z(t, e)[None, :],
                             (n, self.latent.total_channels))
        i = self.input(x)
        hz = z
        for k, ((sw, sb), (mw, mb)) in enumerate(
                zip(self.syn_layers, self.mod_layers)):
            new_h = jax.nn.relu(hz @ mw.T + mb)          # modulator
            # reference ModulatedSine applies sin WITHOUT the w0 factor
            # (network.py:289: torch.sin(self._lin1(i)))
            i = new_h * jnp.sin(i @ sw.T + sb)
            hz = jnp.concatenate([new_h, z], axis=1)
        out = i @ self.out_w.T + self.out_b
        return _apply_output(self.output_mode, out, mode)
