"""Meta-network SRN: a hypernetwork predicts the inner MLP's weights.

Rebuild of ``InnerNetworkMeta``
(reference: applications/volnet/network.py:423-566): latent conditioning
(time/ensemble vectors) feeds a meta MLP whose output is the full
parameter vector of the inner network; the inner network then evaluates
the fourier-encoded positions with those predicted weights. Latents must
be uniform per batch (``supports_mixed_latent_spaces() == False``,
reference: network.py:899-909).

Pretraining protocol (reference: --meta_pretrain, network.py:640-652 and
start_epoch:962-996): phase 1 trains a latent-independent parameter
vector; phase 2 fits the meta net to reproduce it for all training
latents (:func:`fit_meta_to_parameters`); phase 3 trains end-to-end.
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
from .latent import LatentSpace, interp1d
from .srn import InputParametrization, Layer, _apply_output


def _inner_param_count(shapes: Sequence[tuple[int, int]]) -> int:
    return sum(o * i + o for o, i in shapes)


@struct
class MetaSceneNetwork:
    """SRN whose inner weights come from a meta MLP over the latent."""
    input: InputParametrization
    meta_layers: tuple  # tuple[Layer]: z -> parameter vector
    latent: LatentSpace
    inner_shapes: tuple = static_field(default=())   # ((out, in), ...)
    inner_activation: str = static_field(default="SnakeAlt")
    inner_act_param: float = static_field(default=1.0)
    output_mode: str = static_field(default="density")

    @classmethod
    def make(cls, *, layers: str = "32:32", activation: str = "SnakeAlt:2",
             meta_layers: str = "64:64", meta_activation: str = "ReLU",
             output_mode: str = "density", num_fourier: int = 8,
             fourier_std: float = 1.0, latent: LatentSpace = None,
             seed: int = 42) -> "MetaSceneNetwork":
        latent = latent if latent is not None else LatentSpace()
        z_dim = latent.total_channels
        if z_dim == 0:
            raise ValueError("meta network needs latent conditioning")
        inp = InputParametrization.make(
            num_fourier=num_fourier, fourier_std=fourier_std, seed=seed)
        act_name, act_param = parse_activation(activation)
        sizes = [int(s) for s in layers.split(":")]
        out_channels = 1 if output_mode.startswith("density") else 4
        in_ch = inp.num_output_channels()
        shapes = []
        last = in_ch
        for s in sizes:
            shapes.append((s, last))
            last = s
        shapes.append((out_channels, last))
        n_params = _inner_param_count(shapes)

        meta_act, meta_p = parse_activation(meta_activation)
        meta_sizes = [int(s) for s in meta_layers.split(":")]
        rng = np.random.default_rng(seed + 7)
        mlayers = []
        mlast = z_dim
        for s in meta_sizes:
            bound = 1.0 / math.sqrt(mlast)
            mlayers.append(Layer(
                weight=rng.uniform(-bound, bound,
                                   (s, mlast)).astype(np.float32),
                bias=rng.uniform(-bound, bound, (s,)).astype(np.float32),
                activation=meta_act, activation_param=meta_p))
            mlast = s
        # final meta layer: small init so predicted inner weights start
        # near the torch-Linear scale (reference initializes the meta's
        # last layer to reproduce a good prior)
        w = (rng.standard_normal((n_params, mlast))
             * (0.01 / math.sqrt(mlast))).astype(np.float32)
        b = np.concatenate([
            rng.uniform(-1.0 / math.sqrt(i), 1.0 / math.sqrt(i),
                        (o * i + o,)).astype(np.float32)
            for o, i in shapes])
        mlayers.append(Layer(weight=w, bias=b, activation="None"))
        return cls(input=inp, meta_layers=tuple(mlayers), latent=latent,
                   inner_shapes=tuple(shapes),
                   inner_activation=act_name, inner_act_param=act_param,
                   output_mode=output_mode)

    # ------------------------------------------------------------------
    def predict_parameters(self, z: Array) -> Array:
        """z (Z,) -> flat inner parameter vector."""
        h = z[None, :]
        for layer in self.meta_layers:
            h = layer(h)
        return h[0]

    def _unpack(self, params: Array):
        out = []
        off = 0
        for o, i in self.inner_shapes:
            w = params[off:off + o * i].reshape(o, i)
            off += o * i
            b = params[off:off + o]
            off += o
            out.append((w, b))
        return out

    def _latent_z(self, time, ensemble) -> Array:
        """Uniform-batch latent vector (ensemble then time, matching the
        reference's concatenation order, network.py:975-988)."""
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
        z = self._latent_z(t, e)
        params = self.predict_parameters(z)
        y = self.input(x)
        for k, (w, b) in enumerate(self._unpack(params)):
            y = y @ w.T + b
            if k < len(self.inner_shapes) - 1:
                y = apply_activation(self.inner_activation, y,
                                     self.inner_act_param)
        return _apply_output(self.output_mode, y, mode)


def fit_meta_to_parameters(net: MetaSceneNetwork, z_samples: Array,
                           target_params: Array, *, steps: int = 200,
                           lr: float = 1e-3) -> MetaSceneNetwork:
    """Phase-2 pretraining: fit the meta net so it predicts
    ``target_params`` for every training latent
    (reference: InnerNetworkMeta.finish_pretraining + start_epoch,
    network.py:962-996)."""
    import optax

    opt = optax.adam(lr)

    def loss_fn(mlayers):
        net2 = net.replace(meta_layers=mlayers)
        preds = jax.vmap(net2.predict_parameters)(z_samples)
        return jnp.mean((preds - target_params[None, :]) ** 2)

    @jax.jit
    def step(mlayers, opt_state):
        val, grads = jax.value_and_grad(loss_fn)(mlayers)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(mlayers, updates), opt_state, val

    mlayers = net.meta_layers
    opt_state = opt.init(mlayers)
    for _ in range(steps):
        mlayers, opt_state, _ = step(mlayers, opt_state)
    return net.replace(meta_layers=mlayers)
