"""Network-vs-classical-compression comparison ("teaser" figure).

Rebuild of the reference's compression comparison
(reference: applications/volnet/eval_CompressionTeaser.py:1-8,169-241):
fit an SRN at a given parameter budget, compare against Tucker (TThresh)
and quantization baselines at matched byte budgets, report bytes, ratio,
reconstruction PSNR, and render-quality SSIM.

Usage: python -m fvsrn_tpu.eval.eval_compression_teaser [--resolution 64]
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _network_bytes(net) -> int:
    return sum(np.asarray(l).astype(np.float16).nbytes
               for l in jax.tree.leaves(net))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--equation", default="MARSCHNER_LOBB")
    p.add_argument("--train-epochs", type=int, default=60)
    args = p.parse_args(argv)

    import fvsrn_tpu as fv
    from fvsrn_tpu.compression import compression_teaser
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.train.losses import LossNetWorld
    from fvsrn_tpu.train.optimizer import make_optimizer
    from fvsrn_tpu.train.world import build_world_dataset, \
        train_world_epochs
    from fvsrn_tpu.volume.implicit import create_implicit_grid

    grid = np.asarray(create_implicit_grid(args.resolution,
                                           args.equation))
    volume = fv.VolumeInterpolationGrid.from_grid(grid)

    rng = np.random.default_rng(0)
    latent = fv.LatentSpace(static_grid=(
        rng.standard_normal((8, 16, 16, 16)) * 0.01).astype(np.float32))
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=10,
        output_mode="density:direct", latent=latent, seed=2)
    ds = build_world_dataset(volume, 65536, sampler="halton")
    loss = LossNetWorld(mode="density", l1=1.0)
    opt = make_optimizer("Adam", lr=5e-3, lr_step=1000, lr_gamma=0.5)
    net, hist = train_world_epochs(net, ds, loss, opt, batch_size=8192,
                                   epochs=args.train_epochs,
                                   scan_epoch=False)
    print(f"fit: L1 {hist[0]:.4f} -> {hist[-1]:.4f}", file=sys.stderr)

    # network reconstruction PSNR on the voxel grid
    netvol = VolumeInterpolationNetwork.make(net)
    axes = (np.arange(args.resolution) + 0.5) / args.resolution
    gx, gy, gz = np.meshgrid(axes, axes, axes, indexing="ij")
    pos = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3),
                      jnp.float32)
    world = netvol.box_min + pos * netvol.box_size
    rec = np.asarray(netvol.eval_density(world)[0]).reshape(grid.shape)
    mse = float(np.mean((rec - grid) ** 2))
    rng_ = float(grid.max() - grid.min()) or 1.0
    net_psnr = 10 * np.log10(rng_ * rng_ / max(mse, 1e-12))

    table = compression_teaser(grid, _network_bytes(net))
    table["network"]["psnr"] = round(net_psnr, 2)
    table["network"]["final_l1"] = round(hist[-1], 5)
    print(json.dumps(table, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
