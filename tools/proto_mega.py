"""Prototype the Mosaic primitives for the megakernel design:

1. (T, S) grid with segment minor, out block revisited across S
   (accumulator), initialized at s==0 via pl.when.
2. VMEM-resident 3D table, per-program dynamic slice with TRACED
   starts (z arbitrary, y 8-aligned, x 128-aligned).
3. In-kernel lane-min reduction to a scalar feeding pl.ds.
4. Persistent VMEM scratch accumulating across ALL programs with
   dynamic-offset += stores (the in-kernel d_table scatter).

Run on the real TPU: python tools/proto_mega.py
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, S = 4, 3
TILE = 128
Z, Y, X = 34, 34, 640          # table dims (32^3 grid slab layout)
BZ, BY, BX = 6, 16, 256        # slice sizes


def kernel(rays_ref, tab_ref, out_ref, dtab_ref, acc_ref):
    t = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # in-kernel lane reduction -> scalar -> dynamic slice start
    r = rays_ref[:]                     # (8, TILE)
    zmin = jnp.min(r[0, :]).astype(jnp.int32)      # 0..Z-BZ
    zmin = jnp.clip(zmin + s, 0, Z - BZ)
    ymin = jnp.min(r[1, :]).astype(jnp.int32)
    ymin = pl.multiple_of(jnp.clip((ymin // 8) * 8, 0, Y - BY), 8)
    xb = jnp.clip(jnp.min(r[2, :]).astype(jnp.int32), 0, (X - BX) // 128)

    xoff = pl.multiple_of(xb * 128, 128)
    box = tab_ref[pl.ds(zmin, BZ), pl.ds(ymin, BY), pl.ds(xoff, BX)]
    # fold the box to one (8, TILE)-broadcastable scalar-ish quantity
    flat = box.reshape(BZ * BY, BX)
    colsum = jnp.sum(flat, axis=0, keepdims=True)   # (1, BX)
    val = jnp.sum(colsum)                           # scalar
    out_ref[:] += val + r

    # persistent scratch accumulation at dynamic offsets (d_table)
    @pl.when((t == 0) & (s == 0))
    def _init_acc():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    upd = jnp.full((BZ, BY, BX), 1.0, jnp.float32)
    cur = acc_ref[pl.ds(zmin, BZ), pl.ds(ymin, BY), pl.ds(xoff, BX)]
    acc_ref[pl.ds(zmin, BZ), pl.ds(ymin, BY), pl.ds(xoff, BX)] = \
        cur + upd

    @pl.when((t == pl.num_programs(0) - 1) & (s == n_s - 1))
    def _flush():
        dtab_ref[:] = acc_ref[:]


def main():
    rng = np.random.default_rng(0)
    rays = rng.integers(0, 8, (T, 8, TILE)).astype(np.float32)
    rays = rays.reshape(8, T * TILE, order="F")  # (8, T*TILE) tiles on lanes
    # simpler: build (8, T*TILE) where tile t occupies lanes [t*TILE:(t+1)*TILE]
    rays = np.concatenate(
        [rng.integers(0, 8, (8, TILE)).astype(np.float32) for _ in range(T)],
        axis=1)
    tab = rng.standard_normal((Z, Y, X)).astype(np.float32)

    call = pl.pallas_call(
        kernel,
        grid=(T, S),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, s: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, Y, X), lambda t, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, TILE), lambda t, s: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, Y, X), lambda t, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((8, T * TILE), jnp.float32),
                   jax.ShapeDtypeStruct((Z, Y, X), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((Z, Y, X), jnp.float32)],
    )
    out, dtab = jax.jit(call)(rays, tab)
    out = np.asarray(out)
    dtab = np.asarray(dtab)

    # reference
    ref = np.zeros((8, T * TILE), np.float32)
    rtab = np.zeros((Z, Y, X), np.float32)
    for t in range(T):
        r = rays[:, t * TILE:(t + 1) * TILE]
        for s in range(S):
            zmin = int(np.clip(r[0].min() + s, 0, Z - BZ))
            ymin = int(np.clip((r[1].min() // 8) * 8, 0, Y - BY))
            xb = int(np.clip(r[2].min(), 0, (X - BX) // 128))
            box = tab[zmin:zmin + BZ, ymin:ymin + BY,
                      xb * 128:xb * 128 + BX]
            ref[:, t * TILE:(t + 1) * TILE] += box.sum() + r
            rtab[zmin:zmin + BZ, ymin:ymin + BY,
                 xb * 128:xb * 128 + BX] += 1.0
    err1 = np.abs(out - ref).max() / max(1.0, np.abs(ref).max())
    err2 = np.abs(dtab - rtab).max()
    print("out rel err:", err1, "dtab abs err:", err2)
    assert err1 < 1e-5, "out mismatch"
    assert err2 < 1e-5, "dtab mismatch"
    print("PROTO OK")


if __name__ == "__main__":
    main()
