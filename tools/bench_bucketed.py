"""TPU: bucketed vs unbucketed boxfeat fwd / fwd+bwd at the flagship
timing config. Run: tools/tpurun.sh tools/bench_bucketed.py /tmp/bench_bucketed.log"""
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from __graft_entry__ import _build_flagship
from fvsrn_tpu.camera import CameraOnASphere, camera_matrix, generate_rays
from fvsrn_tpu.ops.fused_dvr import (block_ray_permutation, certify_boxfeat,
                                     fused_trace_dvr, fused_trace_dvr_bucketed,
                                     plan_ray_buckets)
from fvsrn_tpu.raytracer.dvr import max_steps_bound

W = H = 512
STEP = 1.0 / 512
SEG, TILE = 32, 256
vol, tf, _ = _build_flagship()
steps = max_steps_bound(vol.box_size, STEP)
mat = np.asarray(camera_matrix(CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)))

@jax.jit
def mk(m):
    s, d = generate_rays(m, W, H, fov_y_radians=0.7853981633974483)
    return s.reshape(-1, 3), d.reshape(-1, 3)

rs, rd = mk(mat)
rs = np.asarray(rs); rd = np.asarray(rd)
perm, inv = block_ray_permutation(W, H, 16, 16)
rs, rd = rs[perm], rd[perm]
bm = np.asarray(vol.box_min); bs = np.asarray(vol.box_size)
net, tft = vol.network, tf.tensor
rs_j, rd_j = jnp.asarray(rs), jnp.asarray(rd)

def timeit(f, *args, reps=3):
    # time to a scalar only (tunnel transfers skew tree materialization)
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(f(*args))[0]).ravel()[:1]
    c = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), c

for nb in [8, 10]:
    plan = plan_ray_buckets(rs, rd, bm, bs, stepsize=STEP, seg=SEG,
                            tile=TILE, n_buckets=nb, grid_sizes=(32, 32, 32))
    print(f"nb={nb} dead={plan.dead} sizes={plan.group_sizes} "
          f"steps={plan.group_steps} nseg={[s.n_seg for s in plan.group_specs]}",
          flush=True)

    @jax.jit
    def fwd(net, tft, rs, rd, plan=plan):
        return jnp.sum(fused_trace_dvr_bucketed(
            rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
            seg=SEG, tile=TILE, enable_early_out=True,
            latent_mode="boxfeat", table_dtype=jnp.bfloat16))

    @jax.jit
    def fwdbwd(net, tft, rs, rd, plan=plan):
        def loss_fn(net, tft):
            c = fused_trace_dvr_bucketed(
                rs, rd, net, bm, bs, tft, plan=plan, stepsize=STEP,
                seg=SEG, tile=TILE, enable_early_out=False,
                differentiable=True, latent_mode="boxfeat",
                table_dtype=jnp.bfloat16)
            return jnp.mean(c ** 2)
        return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

    t_f, c_f = timeit(fwd, net, tft, rs_j, rd_j)
    t_b, c_b = timeit(fwdbwd, net, tft, rs_j, rd_j)
    print(f"nb={nb}: fwd {t_f:.3f}s ({W*H/t_f/1e6:.3f} Mrays/s, c {c_f:.0f}s) "
          f"fwd+bwd {t_b:.3f}s ({W*H/t_b/1e6:.3f} Mrays/s, c {c_b:.0f}s)",
          flush=True)

# unbucketed baseline with the scalar-only timing for apples-to-apples
spec = certify_boxfeat(rs, rd, (32, 32, 32), bm, bs, stepsize=STEP,
                       max_steps=steps, seg=SEG, tile=TILE)

@jax.jit
def fwd_u(net, tft, rs, rd):
    return jnp.sum(fused_trace_dvr(
        rs, rd, net, bm, bs, tft, stepsize=STEP, max_steps=steps,
        seg=SEG, tile=TILE, enable_early_out=True, latent_mode="boxfeat",
        table_dtype=jnp.bfloat16, subbox=spec))

@jax.jit
def fwdbwd_u(net, tft, rs, rd):
    def loss_fn(net, tft):
        c = fused_trace_dvr(
            rs, rd, net, bm, bs, tft, stepsize=STEP, max_steps=steps,
            seg=SEG, tile=TILE, enable_early_out=False,
            differentiable=True, latent_mode="boxfeat",
            table_dtype=jnp.bfloat16, subbox=spec)
        return jnp.mean(c ** 2)
    return jax.value_and_grad(loss_fn, argnums=(0, 1))(net, tft)

t_f, _ = timeit(fwd_u, net, tft, rs_j, rd_j)
t_b, _ = timeit(fwdbwd_u, net, tft, rs_j, rd_j)
print(f"unbucketed: fwd {t_f:.3f}s ({W*H/t_f/1e6:.3f} Mrays/s) "
      f"fwd+bwd {t_b:.3f}s ({W*H/t_b/1e6:.3f} Mrays/s)", flush=True)
