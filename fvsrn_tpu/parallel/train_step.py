"""Sharded training steps (data-parallel over rays/samples).

Original TPU-first machinery (the reference has no distributed path,
SURVEY.md §2.3). The semantics contract: the sharded step produces the SAME
updated parameters as the single-device step on the concatenated batch --
losses here are mean-reductions, so the global gradient is the psum of
per-shard gradients weighted by shard fraction. Implemented with
``shard_map`` + explicit ``jax.lax.psum`` so the all-reduce is visible to
the scheduler and can overlap the backward pass.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.losses import LossNetWorld
from ..train.world import WorldDataset, evaluate_world


def make_dp_world_train_step(mesh: Mesh,
                             loss: LossNetWorld,
                             optimizer: optax.GradientTransformation,
                             axis: str = "data"):
    """Data-parallel world-space train step.

    Batch arrays are sharded over ``axis`` on their leading dimension;
    network params and optimizer state are replicated. Per-shard gradients
    are psum-averaged (equal shard sizes -> pmean == global mean gradient).

    Returns step(network, opt_state, batch) -> (network, opt_state, loss).
    """
    def sharded_grads(net, batch: WorldDataset):
        def local_loss(n):
            total, _ = evaluate_world(n, batch, loss)
            return total

        total, grads = jax.value_and_grad(local_loss)(net)
        # net is unvarying (replicated, P()): jax's shard_map AD already
        # psums its cotangent across the mesh axis, so `grads` holds the
        # SUM of per-shard gradients; with equal shard sizes the global
        # mean gradient is that sum divided by the axis size.
        size = mesh.shape[axis]
        grads = jax.tree.map(lambda g: g / size, grads)
        total = jax.lax.pmean(total, axis)
        return total, grads

    batch_specs = WorldDataset(
        positions=P(axis), targets=P(axis), tf=P(axis), time=P(axis),
        ensemble=P(axis))

    grad_fn = jax.shard_map(
        sharded_grads, mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
    )

    @jax.jit
    def step(network, opt_state, batch: WorldDataset):
        total, grads = grad_fn(network, batch)
        updates, opt_state = optimizer.update(grads, opt_state, network)
        network = optax.apply_updates(network, updates)
        return network, opt_state, total

    return step


def _pmean_in_bwd(axis: str):
    """Identity whose BACKWARD applies ``pmean`` to the cotangent: wrap a
    parameter in the loss function and its gradient's all-reduce is
    issued the moment the backward produces that cotangent -- inside the
    backward stream, not after ``value_and_grad`` returns -- so the
    scheduler can overlap the collective with the rest of the backward
    march (SURVEY §2.3's "psum overlapped with the backward"; verified
    on the HLO schedule by tools/show_overlap.py)."""
    @jax.custom_vjp
    def f(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        return (jax.lax.pmean(g, axis),)

    f.defvjp(fwd, bwd)
    return f


def make_dp_screen_train_step(mesh: Mesh, tf, config, loss,
                              optimizer: optax.GradientTransformation,
                              *, width: int, height: int, max_steps: int,
                              axis: str = "data", use_fused: bool = False,
                              fused_kwargs=None,
                              overlap_grads: bool = False):
    """Data-parallel SCREEN-space train step (BASELINE config 4).

    The camera minibatch (C, H*W, ...) is sharded over ``axis`` on the
    camera dimension -- each device renders and differentiates whole
    images, so windowed image losses (DSSIM) keep exact single-device
    semantics. Params/opt state are replicated; per-shard gradients are
    psum-averaged (equal shard sizes -> global mean gradient). Requires
    cameras-per-batch to be a multiple of the axis size.

    ``overlap_grads``: reduce the LATENT-GRID gradient (the dominant
    tensor: the 32^3 x 16ch flagship grid outweighs the MLP ~40x) inside
    the backward via :func:`_pmean_in_bwd`, so its all-reduce rides ICI
    concurrently with the remaining backward (weight-grad contractions,
    other buckets); the other leaves keep the trailing pmean. Bitwise
    semantics are unchanged (tested vs overlap_grads=False).

    Returns step(network, opt_state, rs, rd, targets) ->
    (network, opt_state, loss).
    """
    from ..train.screen import evaluate_screen

    pmean_bwd = _pmean_in_bwd(axis)

    def sharded_grads(net, rs, rd, tgt):
        wrap = (overlap_grads and net.latent is not None
                and net.latent.static_grid is not None)

        def local_loss(n):
            if wrap:
                n = n.replace(latent=n.latent.replace(
                    static_grid=pmean_bwd(n.latent.static_grid)))
            total, _ = evaluate_screen(
                n, rs, rd, tgt, tf, config, loss, max_steps,
                width, height, use_fused=use_fused,
                fused_kwargs=fused_kwargs)
            return total

        total, grads = jax.value_and_grad(local_loss)(net)
        # check_vma=False disables the automatic psum of the replicated
        # param cotangent -- reduce explicitly. The latent-grid leaf is
        # already reduced in the backward when overlapping; skip its
        # (idempotent but wasteful) second all-reduce.
        if wrap:
            lat_grad = grads.latent.static_grid
            grads = grads.replace(latent=grads.latent.replace(
                static_grid=None))
            grads = jax.lax.pmean(grads, axis)
            grads = grads.replace(latent=grads.latent.replace(
                static_grid=lat_grad))
        else:
            grads = jax.lax.pmean(grads, axis)
        total = jax.lax.pmean(total, axis)
        return total, grads

    # check_vma=False: the DVR march's scan carry starts unvarying and
    # becomes varying (same situation as make_dp_render)
    grad_fn = jax.shard_map(
        sharded_grads, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()), check_vma=False)

    @jax.jit
    def step(network, opt_state, rs, rd, targets):
        total, grads = grad_fn(network, rs, rd, targets)
        updates, opt_state = optimizer.update(grads, opt_state, network)
        network = optax.apply_updates(network, updates)
        return network, opt_state, total

    return step


def compose_over(front, back):
    """Associative 'over' composition of two premultiplied partials
    (rgb, alpha, alpha-weighted normal, alpha-weighted depth pytrees as
    produced by trace_dvr): out = front + (1 - a_front) * back for every
    premultiplied channel, a = a_f + (1 - a_f) * a_b."""
    import jax.numpy as jnp
    a_f = front.color[..., 3:4]
    t_f = 1.0 - a_f
    color = jnp.concatenate(
        [front.color[..., :3] + t_f * back.color[..., :3],
         a_f + t_f * back.color[..., 3:4]], axis=-1)
    return type(front)(color=color,
                       normal=front.normal + t_f * back.normal,
                       depth=front.depth + t_f * back.depth)


def make_cp_render(mesh: Mesh, volume, tf, config, max_steps: int,
                   axis: str = "data", checkpoint_chunk=None):
    """Context-parallel (ray-SEGMENT) rendering: every device marches a
    disjoint span of the step axis for ALL rays, then the per-span
    partials composite with the associative over operator across the
    mesh axis (SURVEY §2.3/§5: samples-along-ray partitioning; the
    reference's only analog is the sequential loop). Exact vs the
    single-device march because (C, alpha) composition is associative;
    requires enable_early_out=False (a span cannot see upstream
    saturation) and a non-preintegrated TF (the previous-density carry
    does not cross span boundaries).

    Complements ray-DP: shard rays when there are many rays per device,
    shard the march when rays are few but the march is long (large
    volumes / tiny viewports).

    Returns render(ray_start, ray_dir) -> RayEvaluationOutput, rays
    replicated, output replicated.
    """
    from ..raytracer.dvr import trace_dvr

    if config.enable_early_out:
        raise ValueError("context-parallel marching requires "
                         "enable_early_out=False (a span cannot see "
                         "upstream saturation)")
    n = mesh.shape[axis]
    span = -(-max_steps // n)

    def local(rs, rd):
        d = jax.lax.axis_index(axis)
        # step_offset must be static per trace; switch over the device
        # index (n branches, each a span-long march)
        branches = [
            (lambda rs, rd, o=i * span: trace_dvr(
                rs, rd, volume, tf, config, span, step_offset=o,
                checkpoint_chunk=checkpoint_chunk))
            for i in range(n)]
        out = jax.lax.switch(d, branches, rs, rd)
        parts = jax.lax.all_gather(out, axis, axis=0, tiled=False)
        comp = jax.tree.map(lambda a: a[0], parts)
        for i in range(1, n):
            comp = compose_over(comp, jax.tree.map(lambda a: a[i], parts))
        return comp

    sharded = jax.shard_map(local, mesh=mesh, in_specs=(P(), P()),
                            out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def make_dp_render(mesh: Mesh, render_rays: Callable, axis: str = "data"):
    """Shard a flat ray-set renderer over devices.

    ``render_rays(ray_start, ray_dir, *replicated_args) -> pytree of (N, ...)``
    becomes a function where rays are split over ``axis`` and every other
    argument is replicated -- ray/tile data parallelism for rendering
    (BASELINE north star: rays sharded, params replicated).
    """
    def wrapper(ray_start, ray_dir, *args):
        return render_rays(ray_start, ray_dir, *args)

    def sharded(ray_start, ray_dir, *args):
        in_specs = (P(axis), P(axis)) + tuple(P() for _ in args)
        # check_vma=False: the DVR march's scan carry starts unvarying
        # (zeros) and becomes varying, which the strict varying-manual-axes
        # analysis rejects; the computation is purely per-shard.
        f = jax.shard_map(wrapper, mesh=mesh, in_specs=in_specs,
                          out_specs=P(axis), check_vma=False)
        return f(ray_start, ray_dir, *args)

    return jax.jit(sharded)
