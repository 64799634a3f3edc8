"""Numpy prototype: per-(tile, segment) latent-grid footprints under
LATTICE-aligned sampling (t = k*h on the global step lattice, tile-uniform
segment base) vs the round-2 per-ray-tmin timing.

Validates the boxfeat design premise: a spatially-coherent 16x16 pixel
tile marching one 32-step segment from a tile-uniform lattice base spans
only a few latent-grid cells per axis, vs the (14, 11, 6) certified for
per-ray-tmin timing (silhouette tiles destroy coherence there).

Pure numpy endpoint-bound replay (positions are monotone in t per axis,
so per-ray per-segment extents are attained at the clamped endpoints).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

WIDTH = HEIGHT = 512
STEPSIZE = 1.0 / 512
SEG, TILE = 32, 256
GRID = (32, 32, 32)


def make_rays(pitch, yaw, distance, fov=0.7853981633974483):
    # numpy replay of camera.generate_rays for a sphere-orbit camera
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    eye = distance * np.array([cp * sy, sp, cp * cy], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    up0 = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, up0)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    t = np.tan(fov / 2)
    ys, xs = np.meshgrid(
        (np.arange(HEIGHT) + 0.5) / HEIGHT * 2 - 1,
        (np.arange(WIDTH) + 0.5) / WIDTH * 2 - 1, indexing="ij")
    d = (fwd[None, None] + xs[..., None] * t * right[None, None]
         - ys[..., None] * t * up[None, None])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rs = np.broadcast_to(eye, d.shape).reshape(-1, 3).astype(np.float32)
    return rs, d.reshape(-1, 3).astype(np.float32)


def block_perm():
    idx = np.arange(HEIGHT * WIDTH).reshape(HEIGHT, WIDTH)
    return (idx.reshape(HEIGHT // 16, 16, WIDTH // 16, 16)
            .transpose(0, 2, 1, 3).reshape(-1))


def footprints(rs, rd, bmin, bsize, lattice: bool):
    res = np.asarray(GRID, np.int64)
    inv = 1.0 / np.where(rd == 0, 1e-12, rd)
    t0 = (bmin - rs) * inv
    t1 = (bmin + bsize - rs) * inv
    tmin = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0).astype(np.float32)
    tmax = np.maximum(np.maximum(t0, t1).min(axis=1), 0.0).astype(np.float32)
    h = np.float32(STEPSIZE)
    n_tiles = rs.shape[0] // TILE

    if lattice:
        k0 = np.ceil(tmin / h)
        k0t = k0.reshape(n_tiles, TILE).min(axis=1)  # tile-uniform base
        k1 = np.floor(tmax / h)
        span = (k1.reshape(n_tiles, TILE).max(axis=1) - k0t + 1)
        n_seg = int(np.ceil(span.max() / SEG))
        base_k = np.repeat(k0t, TILE)
    else:
        k0 = np.zeros_like(tmin)
        base_k = np.zeros_like(tmin)
        import math
        n_seg = int(math.ceil(np.linalg.norm(bsize) / h)) + 1
        n_seg = (n_seg + SEG - 1) // SEG

    ext_max = np.zeros(3, np.int64)
    exts_all = []
    for s in range(n_seg):
        if lattice:
            ta_raw = (base_k + s * SEG) * h
            tb_raw = (base_k + (s * SEG + SEG - 1)) * h
        else:
            ta_raw = tmin + (s * SEG) * h
            tb_raw = tmin + (s * SEG + SEG - 1) * h
        # rays with no valid sample in this segment contribute nothing
        alive = (tb_raw >= tmin) & (ta_raw <= tmax)
        ta = np.clip(ta_raw, tmin, tmax)
        tb = np.clip(tb_raw, tmin, tmax)
        bs_ = []
        for t in (ta, tb):
            pos = rs + rd * t[:, None]
            v = (pos - bmin) / bsize * res - 0.5
            bs_.append(np.clip(np.floor(v).astype(np.int64) + 1, 0, res))
        blo_r = np.where(alive[:, None], np.minimum(*bs_), 10**6)
        bhi_r = np.where(alive[:, None], np.maximum(*bs_), -10**6)
        blo = blo_r.reshape(n_tiles, TILE, 3).min(axis=1)
        bhi = bhi_r.reshape(n_tiles, TILE, 3).max(axis=1)
        ext = np.maximum(bhi - blo + 1, 1)

        exts_all.append(ext)
        ext_max = np.maximum(ext_max, ext.max(axis=0))
    exts = np.concatenate(exts_all, axis=0)
    return ext_max, exts, n_seg


def main():
    bmin = np.array([-0.5, -0.5, -0.5], np.float32)
    bsize = np.array([1.0, 1.0, 1.0], np.float32)
    perm = block_perm()
    for pitch, yaw, dist in [(0.3, 0.5, 1.6), (0.0, 0.0, 2.0),
                             (0.7, 2.1, 1.2), (-0.4, 3.9, 2.5)]:
        rs, rd = make_rays(pitch, yaw, dist)
        rs, rd = rs[perm], rd[perm]
        for lattice in (False, True):
            ext_max, exts, n_seg = footprints(rs, rd, bmin, bsize, lattice)
            p99 = np.percentile(exts, 99, axis=0).astype(int)
            name = "lattice" if lattice else "per-ray"
            szc = ext_max + 1 + 1   # +1 corner, +1 margin cell
            szyc_zy = szc[1] * szc[2]
            nb = int(np.ceil((szc[0] + 7) / 8))
            print(f"cam(p={pitch},y={yaw},d={dist}) {name}: "
                  f"max ext {tuple(ext_max)} p99 {tuple(p99)} "
                  f"n_seg {n_seg} | corners+margin {tuple(szc)} "
                  f"SZYc={szyc_zy} nxb={nb}", flush=True)


if __name__ == "__main__":
    main()
