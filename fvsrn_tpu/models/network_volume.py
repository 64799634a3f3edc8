"""VolumeInterpolationNetwork: render an SRN as a volume.

Rebuild of ``VolumeInterpolationNetwork``
(reference: renderer/volume_interpolation_network.h:609-698): wraps a
``SceneRepresentationNetwork`` behind the volume-interpolation contract
(``eval_density``/``eval_normal`` + box) so the DVR/iso evaluators and the
image evaluator can march through it unchanged.

Gradient modes mirror the reference (GradientMode, h:616-621):
- 'adjoint': exact gradient via JAX AD (the in-kernel wmma adjoint of
  renderer_volume_tensorcores.cuh:1202-1450 is the fused-kernel analogue),
- 'fd': forward differences with ``fd_step``
  (reference: tensorcores.cuh:1184-1194).

The plain-JAX path here is the correctness oracle; the fused Pallas DVR+MLP
kernel in fvsrn_tpu/ops consumes the same pytree.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..utils.pytree import static_field, struct
from .srn import SceneRepresentationNetwork


@struct
class VolumeInterpolationNetwork:
    network: SceneRepresentationNetwork
    box_min: Array = None
    box_size: Array = None
    time: Array = None       # scalar conditioning
    ensemble: Array = None   # scalar conditioning
    gradient_mode: str = static_field(default="adjoint")
    fd_step: float = static_field(default=1e-3)

    @classmethod
    def make(cls, network: SceneRepresentationNetwork,
             box_min=(-0.5, -0.5, -0.5), box_size=(1.0, 1.0, 1.0),
             time: float = 0.0, ensemble: float = 0.0,
             gradient_mode: str = "adjoint", fd_step: float = 1e-3):
        return cls(network=network,
                   box_min=np.asarray(box_min, np.float32),
                   box_size=np.asarray(box_size, np.float32),
                   time=np.float32(time), ensemble=np.float32(ensemble),
                   gradient_mode=gradient_mode, fd_step=fd_step)

    @property
    def outputs_color(self) -> bool:
        """True for rgbo networks: the DVR evaluator should skip the TF
        (reference: RAY_EVALUATION_STEPPING__SKIP_TRANSFER_FUNCTION)."""
        return not self.network.output_mode.startswith("density")

    def _eval_net(self, pos01_flat: Array, direction_flat: Optional[Array]):
        n = pos01_flat.shape[0]
        x = pos01_flat
        if self.network.use_direction:
            if direction_flat is None:
                direction_flat = jnp.zeros_like(pos01_flat)
            x = jnp.concatenate([pos01_flat, direction_flat], axis=1)
        t = jnp.full((n,), self.time, pos01_flat.dtype)
        e = jnp.full((n,), self.ensemble, pos01_flat.dtype)
        return self.network(x, None, t, e, mode="screen")

    def eval_density(self, position: Array, direction: Optional[Array] = None,
                     b: int = 0):
        """World position (..., 3) -> (value, is_inside). For density
        networks value is (...,); for rgbo networks (..., 4)."""
        lead = position.shape[:-1]
        pos01 = (position - self.box_min) / self.box_size
        inside = (jnp.all(pos01 >= 0, axis=-1) & jnp.all(pos01 <= 1, axis=-1))
        flat = pos01.reshape(-1, 3)
        dflat = None
        if direction is not None and self.network.use_direction:
            dflat = jnp.broadcast_to(direction, position.shape).reshape(-1, 3)
        out = self._eval_net(flat, dflat)
        if self.outputs_color:
            return out.reshape(lead + (4,)), inside
        return out.reshape(lead), inside

    def eval_normal(self, position: Array, direction: Optional[Array] = None,
                    b: int = 0):
        """Density gradient wrt world position (..., 3)."""
        if self.outputs_color:
            raise ValueError("normals are only defined for density networks")
        if self.gradient_mode == "fd":
            h = self.fd_step
            offs = jnp.eye(3, dtype=position.dtype) * h
            d0, _ = self.eval_density(position, direction, b)
            grads = [
                (self.eval_density(position + offs[i], direction, b)[0] - d0)
                / h
                for i in range(3)
            ]
            return jnp.stack(grads, axis=-1)
        # adjoint: exact vjp of the scalar density
        def f(p):
            return jnp.sum(self.eval_density(p, direction, b)[0])
        return jax.grad(f)(position)
