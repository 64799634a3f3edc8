"""Training entry point: world- and screen-space SRN fitting.

Rebuild of the reference training driver
(reference: applications/volnet/train_volnet.py:37-358): argparse groups
contributed per component, epoch loop of train -> checkpoint -> validate
-> visualize, adaptive dataset rebuilds from per-voxel loss grids, NaN
abort, and hdf5 run files holding every hyperparameter.

Usage:
  python -m fvsrn_tpu.train.main <scene.json|IMPLICIT:NAME> out.hdf5
      --mode world --layers 32:32:32 --activation SnakeAlt:2 ...
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np


def init_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train a scene representation network "
                    "(reference: volnet/train_volnet.py)")
    p.add_argument("scene", help="scene JSON path or IMPLICIT:<EQUATION>")
    p.add_argument("output", help="output .hdf5 run file")

    g = p.add_argument_group("Network (reference: network.py parser)")
    g.add_argument("--layers", default="32:32:32")
    g.add_argument("--activation", default="SnakeAlt:2")
    g.add_argument("--outputmode", default="density:direct",
                   choices=["density", "density:direct", "rgbo",
                            "rgbo:direct", "rgbo:exp"])
    g.add_argument("--fouriercount", type=int, default=14)
    g.add_argument("--fourierstd", type=float, default=1.0,
                   help="<=0 selects the NeRF block-identity matrix")
    g.add_argument("--volumetric_features_channels", type=int, default=0)
    g.add_argument("--volumetric_features_resolution", type=int,
                   default=0)
    g.add_argument("--volumetric_features_std", type=float, default=0.01)
    g.add_argument("--seed", type=int, default=42)

    g = p.add_argument_group("Data (reference: training_data.py parser)")
    g.add_argument("--mode", choices=["world", "screen"], default="world")
    g.add_argument("--samples", type=int, default=256 ** 2,
                   help="world samples")
    g.add_argument("--sampler", default="halton",
                   choices=["random", "halton", "plastic"])
    g.add_argument("--importance", type=float, default=0.0,
                   help=">0: fraction of importance-sampled positions")
    g.add_argument("--rebuild_dataset", type=int, default=0,
                   help="rebuild the dataset every N epochs from the "
                        "per-voxel loss grid")
    g.add_argument("--screen_cameras", type=int, default=16)
    g.add_argument("--screen_size", type=int, default=64)
    g.add_argument("--data_parallel", type=int, default=0,
                   help="screen mode: shard camera minibatches over N "
                        "devices (0 = single device)")

    g = p.add_argument_group("Optimization (reference: optimizer.py)")
    g.add_argument("-o", "--optimizer", default="Adam")
    g.add_argument("-lr", type=float, default=0.01)
    g.add_argument("-i", "--epochs", type=int, default=50)
    g.add_argument("--lr_gamma", type=float, default=0.5)
    g.add_argument("--lr_step", type=int, default=500)
    g.add_argument("--batch_size", type=int, default=64 * 64 * 2)

    g = p.add_argument_group("Loss (reference: lossnet.py)")
    g.add_argument("-l1", type=float, default=1.0)
    g.add_argument("-l2", type=float, default=0.0)
    g.add_argument("--dssim", type=float, default=0.0)

    g = p.add_argument_group("Output")
    g.add_argument("--save_frequency", type=int, default=10)
    g.add_argument("--tensorboard", default=None,
                   help="TensorBoard log dir (reference: train_volnet.py "
                        "SummaryWriter)")
    g.add_argument("--stepsize", type=float, default=1 / 128)
    g.add_argument("--no_fused", action="store_true",
                   help="screen mode: disable the default fused "
                        "megakernel backward (plain-JAX scan path)")
    g.add_argument("--scan_epoch", action="store_true",
                   help="jit the whole epoch as one scan (fast on CPU "
                        "meshes; slow to compile on the axon tunnel)")
    return p


def _resolve_scene(spec: str):
    from ..modules.registry import load_from_json
    from ..raytracer.dvr import RayEvaluationSteppingDvr
    from ..transfer import TransferFunctionPiecewiseLinear
    from ..volume.implicit import VolumeInterpolationImplicit
    if spec.startswith("IMPLICIT:"):
        vol = VolumeInterpolationImplicit.make(spec.split(":", 1)[1])
        tf = TransferFunctionPiecewiseLinear.make(
            rgb=[[0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
            opacity=[0.0, 20.0], positions=[0.0, 1.0])
        cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 128)
        return vol, tf, cfg
    sc = load_from_json(spec)
    ev = sc.evaluator
    if ev.volume is None:
        raise ValueError("scene has no loadable volume (dataset missing?)")
    return ev.volume, ev.tf, ev.ray_config


def run(opt: dict) -> dict:
    """Programmatic entry; returns {'history': ..., 'network': ...}."""
    from ..models.latent import LatentSpace
    from ..models.network_volume import VolumeInterpolationNetwork
    from ..models.srn import SceneRepresentationNetwork
    from .checkpoints import RunCheckpoint
    from .importance import (importance_sampling,
                             importance_sampling_with_probability_grid,
                             loss_probability_grid)
    from .losses import LossNetScreen, LossNetWorld
    from .optimizer import make_optimizer
    from .screen import build_screen_dataset, train_screen
    from .world import build_world_dataset, train_world_epochs

    volume, tf, ray_config = _resolve_scene(opt["scene"])
    ray_config = ray_config.replace(
        stepsize=np.float32(opt["stepsize"]))

    latent = LatentSpace()
    if (opt["volumetric_features_channels"] > 0
            and opt["volumetric_features_resolution"] > 0):
        rng = np.random.default_rng(opt["seed"])
        r = opt["volumetric_features_resolution"]
        latent = LatentSpace(static_grid=(
            rng.standard_normal(
                (opt["volumetric_features_channels"], r, r, r))
            * opt["volumetric_features_std"]).astype(np.float32))

    net = SceneRepresentationNetwork.make(
        layers=opt["layers"], activation=opt["activation"],
        output_mode=opt["outputmode"], num_fourier=opt["fouriercount"],
        fourier_std=opt["fourierstd"], latent=latent, seed=opt["seed"])

    optimizer = make_optimizer(opt["optimizer"], lr=opt["lr"],
                               lr_step=opt["lr_step"],
                               lr_gamma=opt["lr_gamma"])

    ck = RunCheckpoint(opt["output"])
    ck.set_options({k: v for k, v in opt.items()
                    if isinstance(v, (str, int, float, bool))})

    t_start = time.time()
    history = []
    writer = None
    if opt.get("tensorboard"):
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(opt["tensorboard"])
        except ImportError:
            print("tensorboard unavailable; continuing without",
                  file=sys.stderr)

    def epoch_cb(e, network, loss_val):
        history.append(loss_val)
        ck.append_losses(len(history) - 1, {"total": loss_val},
                         time.time() - t_start)
        if writer is not None:
            writer.add_scalar("loss/total", loss_val, len(history) - 1)
        if (e + 1) % opt["save_frequency"] == 0:
            ck.save_weights(network, len(history) - 1)

    if opt["mode"] == "world":
        # rgbo nets train against TF-mapped colors, density nets against
        # raw densities (reference: training_data.py:328-377 world modes)
        is_rgbo = opt["outputmode"].startswith("rgbo")
        loss = LossNetWorld(mode="rgbo" if is_rgbo else "density",
                            l1=opt["l1"], l2=opt["l2"])
        key = jax.random.PRNGKey(opt["seed"])

        def build_ds(positions=None):
            return build_world_dataset(
                volume, opt["samples"], sampler=opt["sampler"], key=key,
                tf=(tf if is_rgbo else None),
                stepsize=float(opt["stepsize"]),
                positions=positions)

        ds = build_ds()
        if opt["importance"] > 0:
            n_imp = int(opt["samples"] * opt["importance"])
            pos_i, _, _ = importance_sampling(
                jax.random.PRNGKey(opt["seed"] + 1), volume, n_imp,
                tf=tf, min_prob=0.01)
            pos = np.concatenate(
                [np.asarray(ds.positions)[:opt["samples"] - n_imp],
                 np.asarray(pos_i)])
            ds = build_ds(positions=pos)

        rebuild = opt["rebuild_dataset"]
        epochs_left = opt["epochs"]
        phase_len = rebuild if rebuild > 0 else epochs_left
        while epochs_left > 0:
            n = min(phase_len, epochs_left)
            net, hist = train_world_epochs(
                net, ds, loss, optimizer, batch_size=opt["batch_size"],
                epochs=n, scan_epoch=opt.get("scan_epoch", False),
                callback=lambda e, nw, lv: epoch_cb(e, nw, lv))
            epochs_left -= n
            if epochs_left > 0 and rebuild > 0:
                # adaptive rebuild (reference: training_data.py:646-810)
                netvol = VolumeInterpolationNetwork.make(net)
                grid = loss_probability_grid(netvol, volume,
                                             resolution=32)
                pos, _, _ = importance_sampling_with_probability_grid(
                    jax.random.PRNGKey(opt["seed"] + epochs_left),
                    volume, np.asarray(grid), opt["samples"],
                    min_prob=0.05)
                ds = build_ds(positions=np.asarray(pos))
    else:
        loss = LossNetScreen(l1=opt["l1"], l2=opt["l2"],
                             dssim=opt["dssim"])
        ds = build_screen_dataset(
            volume, tf, ray_config, num_cameras=opt["screen_cameras"],
            width=opt["screen_size"], height=opt["screen_size"])
        # product default: route through the fused megakernel backward
        # whenever the config is in the differentiable matrix (the
        # reference trains through its fast path by default,
        # train_volnet.py -> raytracing.py:526-619); --no_fused escapes
        from ..raytracer.dvr import max_steps_bound
        from .screen import fused_screen_supported, screen_mega_kwargs
        max_steps = max_steps_bound(
            (1.0, 1.0, 1.0), float(np.asarray(ray_config.stepsize)))
        use_fused = (not opt.get("no_fused")
                     and fused_screen_supported(net, tf, ds.width,
                                                ds.height))
        fused_kwargs = None
        if use_fused:
            from ..inference import _auto_interpret
            fused_kwargs = screen_mega_kwargs(
                ds, net,
                stepsize=float(np.asarray(ray_config.stepsize)),
                max_steps=max_steps, interpret=_auto_interpret(None))
            print("screen mode: fused megakernel backward enabled "
                  "(--no_fused for the plain path)", file=sys.stderr)
        if opt.get("data_parallel"):
            from ..parallel.mesh import make_mesh
            from .screen import train_screen_dp
            net, hist = train_screen_dp(
                net, ds, tf, ray_config, loss, optimizer,
                epochs=opt["epochs"],
                mesh=make_mesh(opt["data_parallel"]),
                max_steps=max_steps, use_fused=use_fused,
                fused_kwargs=fused_kwargs,
                callback=lambda e, nw, lv: epoch_cb(e, nw, lv))
        else:
            net, hist = train_screen(
                net, ds, tf, ray_config, loss, optimizer,
                epochs=opt["epochs"],
                max_steps=max_steps, use_fused=use_fused,
                fused_kwargs=fused_kwargs,
                callback=lambda e, nw, lv: epoch_cb(e, nw, lv))

    ck.save_weights(net, max(len(history) - 1, 0))
    ck.close()
    if writer is not None:
        writer.close()
    out = {"history": history, "network": net}
    if opt["mode"] == "screen":
        out["fused"] = use_fused
    return out


def main(argv=None):
    opt = vars(init_parser().parse_args(argv))
    result = run(opt)
    h = result["history"]
    print(f"trained {len(h)} epochs; loss {h[0]:.5f} -> {h[-1]:.5f}; "
          f"run file: {opt['output']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
