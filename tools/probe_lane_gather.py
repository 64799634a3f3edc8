"""TPU probe: can Mosaic lower a lane-table gather (take_along_axis along
lanes) inside a Pallas kernel, and how does it cost against the one-hot
MXU contraction the sub-box latent path currently uses?

Shapes mirror the sub-box resolve: table rows (sz3p, 128ch) transposed to
(128ch, sz3p<=128 lanes); per-sample local rows (N=8192,) resolved to
(128, N) rows.

Run: tools/tpurun.sh tools/probe_lane_gather.py /tmp/probe_gather.log
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N = 8192
ITERS = 400


def timeit(f, *args):
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS


def probe_gather_single(dtype):
    """(128, 128) lane table, (128, N) idx -> (128, N)."""
    def kern(tab_ref, idx_ref, out_ref):
        for _ in range(ITERS):
            out_ref[:] = jnp.take_along_axis(
                tab_ref[:], idx_ref[:], axis=1).astype(jnp.float32)

    tab = np.random.default_rng(0).standard_normal((128, 128)).astype(
        np.float32)
    idx = np.random.default_rng(1).integers(0, 128, (128, N)).astype(
        np.int32)
    f = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, N), jnp.float32)))
    out = np.asarray(f(tab.astype(dtype), jnp.asarray(idx)))
    want = np.take_along_axis(tab.astype(dtype), idx, axis=1).astype(
        np.float32)
    ok = np.array_equal(out, want)
    dt = timeit(f, tab.astype(dtype), jnp.asarray(idx))
    return ok, dt


def probe_gather_chunked(sz3p, dtype):
    """(sz3p, 128) table resolved by 128-row chunks + select."""
    chunks = (sz3p + 127) // 128

    def kern(tab_ref, idx_ref, out_ref):
        for _ in range(ITERS // 8):
            idx = idx_ref[:]
            acc = None
            for c in range(chunks):
                lo = c * 128
                sub = tab_ref[:, lo:lo + 128]          # (128, 128)
                local = jnp.clip(idx - lo, 0, 127)
                got = jnp.take_along_axis(sub, local, axis=1)
                m = (idx >= lo) & (idx < lo + 128)
                got = jnp.where(m, got, 0.0)
                acc = got if acc is None else acc + got
            out_ref[:] = acc.astype(jnp.float32)

    tabT = np.random.default_rng(0).standard_normal((128, sz3p)).astype(
        np.float32)
    idx = np.random.default_rng(1).integers(0, sz3p, (128, N)).astype(
        np.int32)
    f = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, N), jnp.float32)))
    out = np.asarray(f(tabT.astype(dtype), jnp.asarray(idx)))
    want = np.take_along_axis(tabT.astype(dtype), idx, axis=1).astype(
        np.float32)
    ok = np.allclose(out, want)
    dt = timeit(f, tabT.astype(dtype), jnp.asarray(idx)) * 8
    return ok, dt


def probe_onehot(sz3p, dtype):
    """Current sub-box resolve: one-hot (sz3p, N) MXU contraction."""
    def kern(tab_ref, lrow_ref, out_ref):
        for _ in range(ITERS // 8):
            lrow = lrow_ref[:].astype(jnp.int32)
            iot = jax.lax.broadcasted_iota(jnp.int32, (sz3p, N), 0)
            oh = (iot == lrow).astype(tab_ref.dtype)
            out_ref[:] = jax.lax.dot_general(
                tab_ref[:], oh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    tab = np.random.default_rng(0).standard_normal((sz3p, 128)).astype(
        np.float32)
    lrow = np.random.default_rng(1).integers(0, sz3p, (1, N)).astype(
        np.int32)
    f = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, N), jnp.float32)))
    out = np.asarray(f(tab.astype(dtype), jnp.asarray(lrow)))
    want = tab.astype(dtype).astype(np.float32)[lrow[0]].T
    ok = np.allclose(out, want, atol=1e-3)
    dt = timeit(f, tab.astype(dtype), jnp.asarray(lrow)) * 8
    return ok, dt


def main():
    print("devices:", jax.devices(), flush=True)
    for name, fn in [
        ("gather single f32", lambda: probe_gather_single(jnp.float32)),
        ("gather single bf16", lambda: probe_gather_single(jnp.bfloat16)),
        ("gather chunked 928 f32",
         lambda: probe_gather_chunked(928, jnp.float32)),
        ("onehot 128 bf16", lambda: probe_onehot(128, jnp.bfloat16)),
        ("onehot 928 bf16", lambda: probe_onehot(928, jnp.bfloat16)),
    ]:
        try:
            ok, dt = fn()
            print(f"{name}: ok={ok} {dt*1e6:.1f} us/call "
                  f"({dt*1e9/N:.2f} ns/sample)", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:300]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
