"""Ensemble generalization: retrain only the ensemble latent grid.

Rebuild of the reference's generalization training
(reference: applications/volnet/train_ensemble_generalization.py and
``SceneRepresentationNetwork.generalize_to_new_ensembles``,
network.py:776-796): a pretrained network's MLP weights are frozen and a
fresh per-ensemble latent grid is fitted to new ensemble members.

Implemented TPU-first via gradient masking: the train step zeroes
cotangents outside the latent-grid subtree, so the same jitted/sharded
step machinery serves full training and generalization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.latent import LatentSpace
from ..models.srn import SceneRepresentationNetwork


def generalize_to_new_ensembles(net: SceneRepresentationNetwork,
                                num_ensembles: int,
                                std: float = 0.01,
                                seed: int = 0) -> SceneRepresentationNetwork:
    """Replace the ensemble latent grid with a fresh one for
    ``num_ensembles`` members (reference: network.py:776-796)."""
    latent = net.latent
    if latent.ensemble_grid is None:
        raise ValueError(
            "network was not built with ensemble-dependent latent grids")
    e, c, r = (num_ensembles, latent.ensemble_grid.shape[1],
               latent.ensemble_grid.shape[2])
    rng = np.random.default_rng(seed)
    grid = (rng.standard_normal(
        (e, c) + latent.ensemble_grid.shape[2:]) * std).astype(np.float32)
    return net.replace(latent=latent.replace(ensemble_grid=grid))


def latent_only_mask(grads: SceneRepresentationNetwork
                     ) -> SceneRepresentationNetwork:
    """Gradient mask freezing everything except the latent grids; pass as
    ``trainable`` to ``make_train_step``
    (the reference freezes net parameters and optimizes only the new
    grid, train_ensemble_generalization.py)."""
    zeroed = jax.tree.map(jnp.zeros_like, grads)
    return zeroed.replace(latent=grads.latent)
