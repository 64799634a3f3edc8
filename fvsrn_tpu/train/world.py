"""World-space SRN training: fit the network to volume samples.

Rebuild of the world-space path of the reference training stack:
- dataset generation: positions sampled in [0,1]^3, targets from the volume
  (+TF for rgbo losses) (reference: applications/volnet/training_data.py:
  303-406 world dataset).
- evaluation: network forward on positions + world loss
  (reference: applications/volnet/evaluation.py:59-96 ``EvaluateWorld``).
- epoch loop: train -> validate, optax Adam + StepLR
  (reference: applications/volnet/train_volnet.py:225-353).

TPU-first: the whole epoch runs as one jitted ``lax.scan`` over minibatches
(data stays on device), and the train step is ready for ``jax.sharding``
batch sharding (pure function of (params, opt_state, batch)).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from ..models.srn import SceneRepresentationNetwork
from .losses import LossNetWorld
from .sampling import get_sampled_positions


class WorldDataset(NamedTuple):
    """Device-resident world-space training data."""
    positions: Array  # (N, 3) in [0, 1]^3
    targets: Array    # (N, 1) densities or (N, 4) rgbo
    tf: Array         # (N,) tf index (conditioning)
    time: Array       # (N,)
    ensemble: Array   # (N,)


def build_world_dataset(volume, num_samples: int, *, sampler: str = "random",
                        tf=None, density_min: float = 0.0,
                        density_max: float = 1.0, stepsize: float = 1.0,
                        time: float = 0.0, ensemble: float = 0.0,
                        start_index: int = 0, key=None,
                        positions: Optional[np.ndarray] = None,
                        dtype=jnp.float32) -> WorldDataset:
    """Sample positions and evaluate ground-truth targets.

    With ``tf=None`` targets are densities (N, 1); with a TF they are rgbo
    colors via the tensor API (reference: training_data.py:328-377).
    Positions are in [0,1]^3; the volume is evaluated at
    box_min + p * box_size (the reference's ``evaluate`` tensor API operates
    in the same normalized space, volume_interpolation.cpp:53).
    """
    if positions is None:
        positions = get_sampled_positions(sampler, num_samples, 3,
                                          start_index, key=key)
    positions = jnp.asarray(positions, dtype)

    @jax.jit
    def _targets(pos):
        world = volume.box_min + pos * volume.box_size
        density, _ = volume.eval_density(world)
        density = density[..., None]
        if tf is None:
            return density
        from .. import transfer as _transfer
        return _transfer.evaluate(tf, density, density_min, density_max,
                                  stepsize=stepsize)

    targets = _targets(positions)
    n = positions.shape[0]
    return WorldDataset(
        positions=positions, targets=targets,
        tf=jnp.zeros((n,), dtype),
        time=jnp.full((n,), time, dtype),
        ensemble=jnp.full((n,), ensemble, dtype))


def evaluate_world(network: SceneRepresentationNetwork, batch: WorldDataset,
                   loss: LossNetWorld):
    """Forward + loss on a batch (reference: evaluation.py:59-96)."""
    pred = network(batch.positions, batch.tf, batch.time, batch.ensemble,
                   mode="world")
    total, individual = loss(pred, batch.targets, return_individual=True)
    return total, individual


def make_train_step(loss: LossNetWorld,
                    optimizer: optax.GradientTransformation,
                    trainable: Callable[[Any], Any] = None):
    """Build the jitted train step: (network, opt_state, batch) -> updated.

    ``trainable`` optionally masks the differentiated subtree (e.g. only the
    ensemble latent grid for generalization training, reference:
    train_ensemble_generalization.py / network.py:776-796).
    """
    def step(network, opt_state, batch: WorldDataset):
        def loss_fn(net):
            total, individual = evaluate_world(net, batch, loss)
            return total, individual

        (total, individual), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(network)
        if trainable is not None:
            grads = trainable(grads)
        updates, opt_state = optimizer.update(grads, opt_state, network)
        network = optax.apply_updates(network, updates)
        return network, opt_state, total, individual

    return step


def train_world_epochs(network: SceneRepresentationNetwork,
                       dataset: WorldDataset,
                       loss: LossNetWorld,
                       optimizer: optax.GradientTransformation,
                       *, batch_size: int, epochs: int,
                       key=None, shuffle: bool = True,
                       callback=None, scan_epoch: bool = True):
    """Run ``epochs`` epochs of minibatch training
    (reference: train_volnet.py:238-251 epoch loop).

    ``scan_epoch=True`` runs each epoch as one jitted ``lax.scan`` over
    minibatches (fastest steady-state; data never leaves the device).
    ``scan_epoch=False`` python-loops a single jitted step -- use this on
    backends where grad-inside-scan programs compile pathologically slowly
    (the axon TPU tunnel; see .claude/skills/verify/SKILL.md).

    Returns (network, history) with per-epoch mean total loss.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = dataset.positions.shape[0]
    # a dataset smaller than one batch still trains (one full-data batch
    # per epoch) instead of silently running zero steps
    batch_size = min(batch_size, n)
    nbatch = n // batch_size
    opt_state = optimizer.init(network)
    step = make_train_step(loss, optimizer)
    step_jit = jax.jit(step)

    @jax.jit
    def epoch_fn(network, opt_state, perm, data: WorldDataset):
        def body(carry, idx):
            net, opt = carry
            batch = jax.tree.map(
                lambda a: jnp.take(a, jax.lax.dynamic_slice_in_dim(
                    perm, idx * batch_size, batch_size), axis=0), data)
            net, opt, total, _ = step(net, opt, batch)
            return (net, opt), total
        (network, opt_state), totals = jax.lax.scan(
            body, (network, opt_state), jnp.arange(nbatch))
        return network, opt_state, jnp.mean(totals)

    @jax.jit
    def gather_batch(perm, data, i):
        idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
        return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)

    history = []
    for e in range(epochs):
        key, sub = jax.random.split(key)
        perm = (jax.random.permutation(sub, n) if shuffle
                else jnp.arange(n))
        if scan_epoch:
            network, opt_state, mean_loss = epoch_fn(network, opt_state,
                                                     perm, dataset)
        else:
            totals = []
            for i in range(nbatch):
                batch = gather_batch(perm, dataset, jnp.int32(i))
                network, opt_state, total, _ = step_jit(network, opt_state,
                                                        batch)
                totals.append(total)
            mean_loss = jnp.mean(jnp.stack(totals))
        history.append(float(mean_loss))
        if callback is not None:
            callback(e, network, float(mean_loss))
        if not np.isfinite(history[-1]):
            # NaN abort (reference: train_volnet.py:352-353)
            raise FloatingPointError(
                f"training loss became non-finite at epoch {e}")
    return network, history
