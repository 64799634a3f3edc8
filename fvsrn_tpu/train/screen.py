"""Screen-space SRN training: differentiable rendering loss.

Rebuild of the reference's screen-space path:
- dataset: fibonacci-sphere cameras + ground-truth renders of the
  reference volume (reference: applications/volnet/training_data.py:
  408-522 screen dataset), with optional per-ray alpha-based rejection
  subsampling;
- evaluation: differentiable trace of the SRN + image loss
  (reference: applications/volnet/evaluation.py:17-57 ``EvaluateScreen``,
  raytracing.py checkpointed trace);
- training loop: minibatches of cameras, Adam+StepLR, NaN abort
  (reference: train_volnet.py:225-353).

The differentiable trace is the plain-JAX scan with per-step
rematerialization; ``use_fused=True`` routes supported configurations
through the fused Pallas backward -- density AND rgbo outputs times
every TF family (piecewise/texture/gaussian/preint-1D/preint-2D, the
full round-4 differentiable matrix; see ``_tf_mode_kwargs`` and
``ops/fused_mega.py``). Only shaded/iso losses stay on the plain path.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from ..camera import fibonacci_sphere_cameras, generate_rays
from ..models.network_volume import VolumeInterpolationNetwork
from ..raytracer.dvr import (RayEvaluationSteppingDvr, max_steps_bound,
                             trace_dvr)
from .losses import LossNetScreen


class ScreenDataset(NamedTuple):
    """Per-camera rays + ground-truth rgba images (flattened)."""
    ray_start: Array   # (C, H*W, 3)
    ray_dir: Array     # (C, H*W, 3)
    targets: Array     # (C, H*W, 4)
    width: int
    height: int


def build_screen_dataset(volume, tf, config: RayEvaluationSteppingDvr,
                         *, num_cameras: int = 16, width: int = 64,
                         height: int = 64, distance: float = 1.6,
                         center=(0.0, 0.0, 0.0),
                         max_steps: Optional[int] = None,
                         render_chunk: int = 8192,
                         cache_path: Optional[str] = None) -> ScreenDataset:
    """Render GT images from fibonacci-sphere cameras
    (reference: training_data.py:408-452). ``cache_path``: optional hdf5
    file caching the expensive ground-truth renders across runs
    (reference: training_data.py:82-126 ``_MCCache``)."""
    import os
    if cache_path is not None and os.path.exists(cache_path):
        import h5py
        with h5py.File(cache_path, "r") as f:
            if (f.attrs.get("num_cameras") == num_cameras
                    and f.attrs.get("width") == width
                    and f.attrs.get("height") == height):
                return ScreenDataset(
                    ray_start=jnp.asarray(f["ray_start"]),
                    ray_dir=jnp.asarray(f["ray_dir"]),
                    targets=jnp.asarray(f["targets"]),
                    width=width, height=height)
    cams = fibonacci_sphere_cameras(num_cameras, center=center,
                                    distance=distance)
    start, direction = generate_rays(cams, width, height)
    start = start.reshape(num_cameras, -1, 3)
    direction = direction.reshape(num_cameras, -1, 3)
    if max_steps is None:
        max_steps = max_steps_bound(np.asarray(volume.box_size),
                                    float(np.asarray(config.stepsize)))

    @jax.jit
    def render(rs, rd):
        return trace_dvr(rs, rd, volume, tf, config, max_steps).color

    targets = []
    for c in range(num_cameras):
        outs = [render(start[c, i:i + render_chunk],
                       direction[c, i:i + render_chunk])
                for i in range(0, start.shape[1], render_chunk)]
        targets.append(jnp.concatenate(outs, axis=0))
    ds = ScreenDataset(ray_start=start, ray_dir=direction,
                       targets=jnp.stack(targets), width=width,
                       height=height)
    if cache_path is not None:
        import h5py
        with h5py.File(cache_path, "w") as f:
            f.attrs["num_cameras"] = num_cameras
            f.attrs["width"] = width
            f.attrs["height"] = height
            f.create_dataset("ray_start", data=np.asarray(ds.ray_start))
            f.create_dataset("ray_dir", data=np.asarray(ds.ray_dir))
            f.create_dataset("targets", data=np.asarray(ds.targets))
    return ds


def screen_mega_kwargs(dataset: "ScreenDataset", network, *,
                       stepsize: float, max_steps: int,
                       seg: int = 32, tile: int = 256,
                       block: int = 16, interpret: bool = False) -> dict:
    """Precompute the static state that lets screen-space training run
    through the MEGAKERNEL engine under jit: a pixel-block permutation
    (spatially coherent ray tiles) and ONE boxfeat footprint certificate
    over the union of all training cameras' rays (the occupancy-chooser
    pre-pass; certify_boxfeat needs concrete rays, so it runs here, once
    -- inside the jitted train step only the static spec is consumed).
    Returns a ``fused_kwargs`` dict for :func:`evaluate_screen` /
    :func:`make_dp_screen_train_step` (``engine="mega"``)."""
    from ..models.network_volume import VolumeInterpolationNetwork
    from ..ops.fused_dvr import (block_ray_permutation, certify_boxfeat)
    netvol = VolumeInterpolationNetwork.make(network)
    w, h = dataset.width, dataset.height
    bw = bh = block
    if w * h < tile:
        raise ValueError("image smaller than one ray tile")
    perm, inv = block_ray_permutation(w, h, bw, bh)
    rs = np.asarray(dataset.ray_start)[:, perm].reshape(-1, 3)
    rd = np.asarray(dataset.ray_dir)[:, perm].reshape(-1, 3)
    grid = network.latent.static_grid if network.latent is not None \
        else None
    if grid is None:
        spec = None
    else:
        gs = (int(grid.shape[3]), int(grid.shape[2]),
              int(grid.shape[1]))
        spec = certify_boxfeat(
            rs, rd, gs, np.asarray(netvol.box_min),
            np.asarray(netvol.box_size), stepsize=float(stepsize),
            max_steps=max_steps, seg=seg, tile=tile)
    return dict(engine="mega", subbox=(spec if spec is not None else 0),
                block_perm=perm, block_perm_inv=inv, seg=seg,
                tile=tile, interpret=interpret)


def fused_screen_supported(network, tf, width: int, height: int,
                           table_dtype=jnp.float32) -> bool:
    """Product-trainer eligibility for the megakernel screen backward.

    ``train/main.py`` auto-routes ``use_fused=True`` whenever this holds
    (the reference likewise trains through its fast path by default,
    train_volnet.py -> raytracing.py:526-619). Supported = the round-4
    differentiable matrix: density/rgbo outputs x piecewise/texture/
    gaussian/preintegrated TFs, latent conditioning that is either
    1D vectors (folded into the first-layer bias) or ONE static grid
    (<= 16 channels, VMEM slab fits -- ``mega_supported``), and images
    that tile into 16x16 pixel blocks with at least one 256-ray tile.
    Keyframed time/ensemble GRIDS fall back to the plain path (their
    per-frame resolve is not certified by ``screen_mega_kwargs``)."""
    from ..ops.fused_mega import mega_supported
    from ..transfer import (TransferFunctionGaussian,
                            TransferFunctionPiecewiseLinear,
                            TransferFunctionTexture)
    if not isinstance(tf, (TransferFunctionPiecewiseLinear,
                           TransferFunctionTexture,
                           TransferFunctionGaussian)):
        return False
    if width % 16 or height % 16 or width * height < 256:
        return False
    lat = network.latent
    if lat is not None:
        if lat.time_grid is not None or lat.ensemble_grid is not None:
            return False
        g = lat.static_grid
        if g is not None and not mega_supported(tuple(g.shape),
                                                table_dtype):
            return False
    return True


def _tf_mode_kwargs(tf) -> dict:
    """Static fused-kernel TF options derived from the TF object, so
    screen training routes EVERY TF family through the fused backward
    (round 4: the differentiable matrix covers piecewise/texture/
    gaussian/preint1d/preint2d; reference: raytracing.py:121-157
    _predict dispatches on the TF the same way)."""
    from ..transfer import (TransferFunctionGaussian,
                            TransferFunctionTexture)
    if isinstance(tf, TransferFunctionTexture):
        if tf.preintegration_mode == 1:
            return dict(tf_mode="preint1d", tf_pre=tf.preintegrated)
        if tf.preintegration_mode == 2:
            return dict(tf_mode="preint2d", tf_pre=tf.preintegrated)
        return dict(tf_mode="texture")
    if isinstance(tf, TransferFunctionGaussian):
        return dict(tf_mode="gaussian")
    return {}


def evaluate_screen(network, batch_rays_start, batch_rays_dir,
                    batch_targets, tf, config: RayEvaluationSteppingDvr,
                    loss: LossNetScreen, max_steps: int,
                    width: int, height: int, use_fused: bool = False,
                    fused_kwargs: Optional[dict] = None):
    """Differentiable render + image loss
    (reference: evaluation.py:17-57). ``fused_kwargs``: extra static
    options for the fused kernel (seg/tile/latent_mode/subbox/interpret);
    ``engine="mega"`` (see :func:`screen_mega_kwargs`) routes the render
    through the single-call megakernel with differentiable early-out
    (exact gated adjoint)."""
    netvol = VolumeInterpolationNetwork.make(network)
    fk = dict(fused_kwargs or {})
    engine = fk.pop("engine", "scan") if use_fused else "scan"
    if use_fused and "tf_mode" not in fk:
        fk.update(_tf_mode_kwargs(tf))
    if use_fused and engine == "mega":
        from ..ops.fused_mega import mega_trace_dvr
        perm = fk.pop("block_perm", None)
        inv = fk.pop("block_perm_inv", None)
        hw = width * height
        rs = batch_rays_start.reshape(-1, hw, 3)
        rd = batch_rays_dir.reshape(-1, hw, 3)
        if perm is not None:
            pj = jnp.asarray(perm)
            rs = jnp.take(rs, pj, axis=1)
            rd = jnp.take(rd, pj, axis=1)
        color = mega_trace_dvr(
            rs.reshape(-1, 3), rd.reshape(-1, 3), network,
            np.asarray(netvol.box_min), np.asarray(netvol.box_size),
            tf.tensor, stepsize=float(np.asarray(config.stepsize)),
            max_steps=max_steps, differentiable=True, **fk)
        color = color.reshape(-1, hw, 4)
        if inv is not None:
            color = jnp.take(color, jnp.asarray(inv), axis=1)
        color = color.reshape(-1, 4)
    elif use_fused:
        from ..ops.fused_dvr import fused_trace_dvr
        color = fused_trace_dvr(
            batch_rays_start.reshape(-1, 3),
            batch_rays_dir.reshape(-1, 3), network,
            np.asarray(netvol.box_min), np.asarray(netvol.box_size),
            tf.tensor, stepsize=float(np.asarray(config.stepsize)),
            max_steps=max_steps, enable_early_out=False,
            differentiable=True, **fk)
    else:
        out = trace_dvr(batch_rays_start.reshape(-1, 3),
                        batch_rays_dir.reshape(-1, 3), netvol, tf,
                        config, max_steps, checkpoint_chunk=1)
        color = out.color
    b = batch_targets.shape[0] if batch_targets.ndim == 3 else 1
    pred = jnp.moveaxis(color.reshape(b, height, width, 4), -1, 1)
    ref = jnp.moveaxis(batch_targets.reshape(b, height, width, 4), -1, 1)
    return loss(pred, ref, return_individual=True)


def train_screen(network, dataset: ScreenDataset, tf,
                 config: RayEvaluationSteppingDvr,
                 loss: LossNetScreen,
                 optimizer: optax.GradientTransformation,
                 *, epochs: int, cameras_per_batch: int = 1,
                 max_steps: Optional[int] = None, key=None,
                 use_fused: bool = False, fused_kwargs=None,
                 callback=None):
    """Epoch loop over camera minibatches
    (reference: train_volnet.py:238-251, screen mode).

    Returns (network, history)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_cams = dataset.ray_start.shape[0]
    if max_steps is None:
        max_steps = max_steps_bound(
            (1.0, 1.0, 1.0), float(np.asarray(config.stepsize)))
    opt_state = optimizer.init(network)

    @jax.jit
    def step(network, opt_state, rs, rd, tgt):
        def loss_fn(net):
            total, individual = evaluate_screen(
                net, rs, rd, tgt, tf, config, loss, max_steps,
                dataset.width, dataset.height, use_fused=use_fused,
                fused_kwargs=fused_kwargs)
            return total, individual

        (total, individual), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(network)
        updates, opt_state = optimizer.update(grads, opt_state, network)
        network = optax.apply_updates(network, updates)
        return network, opt_state, total

    history = []
    for e in range(epochs):
        key, sub = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(sub, n_cams))
        totals = []
        for i in range(0, n_cams, cameras_per_batch):
            idx = perm[i:i + cameras_per_batch]
            network, opt_state, total = step(
                network, opt_state, dataset.ray_start[idx],
                dataset.ray_dir[idx], dataset.targets[idx])
            totals.append(float(total))
        history.append(float(np.mean(totals)))
        if callback is not None:
            callback(e, network, history[-1])
        if not np.isfinite(history[-1]):
            raise FloatingPointError(
                f"screen training loss became non-finite at epoch {e}")
    return network, history


def train_screen_dp(network, dataset: ScreenDataset, tf,
                    config: RayEvaluationSteppingDvr,
                    loss: LossNetScreen,
                    optimizer: optax.GradientTransformation,
                    *, epochs: int, mesh, axis: str = "data",
                    max_steps: Optional[int] = None, key=None,
                    use_fused: bool = False, fused_kwargs=None,
                    callback=None):
    """Data-parallel screen-space epoch loop (BASELINE config 4): each
    step shards one camera minibatch of ``mesh`` size over the data
    axis via :func:`fvsrn_tpu.parallel.train_step.make_dp_screen_train_step`
    (params replicated, gradients pmean'd; identical update to the
    single-device step on the full batch -- tests/test_parallel.py).

    Returns (network, history)."""
    from ..parallel.mesh import replicate, shard_batch
    from ..parallel.train_step import make_dp_screen_train_step

    if key is None:
        key = jax.random.PRNGKey(0)
    n_dev = mesh.shape[axis]
    n_cams = dataset.ray_start.shape[0]
    if n_cams % n_dev:
        raise ValueError(f"need cameras ({n_cams}) divisible by the "
                         f"mesh axis ({n_dev})")
    if max_steps is None:
        max_steps = max_steps_bound(
            (1.0, 1.0, 1.0), float(np.asarray(config.stepsize)))
    step = make_dp_screen_train_step(
        mesh, tf, config, loss, optimizer, width=dataset.width,
        height=dataset.height, max_steps=max_steps, axis=axis,
        use_fused=use_fused, fused_kwargs=fused_kwargs)
    network = replicate(mesh, network)
    opt_state = replicate(mesh, optimizer.init(network))
    rs_all = np.asarray(dataset.ray_start)
    rd_all = np.asarray(dataset.ray_dir)
    tgt_all = np.asarray(dataset.targets)
    history = []
    for e in range(epochs):
        key, sub = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(sub, n_cams))
        totals = []
        for i in range(0, n_cams, n_dev):
            idx = perm[i:i + n_dev]
            network, opt_state, total = step(
                network, opt_state,
                shard_batch(mesh, jnp.asarray(rs_all[idx])),
                shard_batch(mesh, jnp.asarray(rd_all[idx])),
                shard_batch(mesh, jnp.asarray(tgt_all[idx])))
            totals.append(float(total))
        history.append(float(np.mean(totals)))
        if callback is not None:
            callback(e, network, history[-1])
        if not np.isfinite(history[-1]):
            raise FloatingPointError(
                f"screen DP training loss became non-finite at epoch {e}")
    return network, history
