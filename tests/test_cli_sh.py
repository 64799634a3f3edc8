"""CLI converter + spherical harmonics tests
(reference: cli/cli.cpp; renderer/spherical_harmonics.h)."""
import os
import struct

import numpy as np
import jax.numpy as jnp

from fvsrn_tpu import sh
from fvsrn_tpu.cli import load_dat, load_xyz, main
from fvsrn_tpu.volume.volume import Volume


def test_dat_conversion(tmp_path, rng):
    raw = rng.integers(0, 255, (4, 5, 6), dtype=np.uint8)  # (Z,Y,X)? raw
    # file layout: X fastest -> write as (Z, Y, X)
    (tmp_path / "vol.raw").write_bytes(raw.tobytes())
    (tmp_path / "vol.dat").write_text(
        "ObjectFileName: vol.raw\n"
        "Resolution: 6 5 4\n"
        "SliceThickness: 1 1 1\n"
        "Format: UCHAR\n")
    v = load_dat(str(tmp_path / "vol.dat"))
    lvl = v.features[0].levels[0]
    assert (lvl.size_x, lvl.size_y, lvl.size_z) == (6, 5, 4)
    np.testing.assert_array_equal(lvl.data[..., 0], raw)
    # cli end-to-end
    out = str(tmp_path / "out.cvol")
    assert main([str(tmp_path / "vol.dat"), out]) == 0
    v2 = Volume.load(out)
    np.testing.assert_array_equal(v2.features[0].levels[0].data,
                                  lvl.data)


def test_xyz_conversion(tmp_path, rng):
    sx, sy, sz = 3, 4, 5
    data = rng.random((sx, sy, sz)).astype(np.float32)  # z fastest
    with open(tmp_path / "v.xyz", "wb") as f:
        f.write(struct.pack("<3I", sx, sy, sz))
        f.write(struct.pack("<3d", 1.0, 1.0, 1.0))
        f.write(data.tobytes())
    v = load_xyz(str(tmp_path / "v.xyz"))
    lvl = v.features[0].levels[0]
    assert (lvl.size_x, lvl.size_y, lvl.size_z) == (sx, sy, sz)
    # world size normalized by the largest axis (reference: :1162-1173)
    np.testing.assert_allclose(v.world_size, (0.6, 0.8, 1.0))
    # value check: data[x, y, z] must land at lvl.data[z, y, x]
    np.testing.assert_allclose(lvl.data[4, 2, 1, 0], data[1, 2, 4])


def test_sh_orthonormality(rng):
    """Monte-Carlo check: int Y_i Y_j dOmega = delta_ij."""
    n = 200000
    v = rng.standard_normal((n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    basis = np.asarray(sh.evaluate(jnp.asarray(v), 2))  # (n, 9)
    gram = basis.T @ basis / n * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_sh_indexing():
    assert sh.get_coefficient_count(0) == 1
    assert sh.get_coefficient_count(2) == 9
    assert sh.get_index(0, 0) == 0
    assert sh.get_index(1, -1) == 1
    assert sh.get_index(1, 0) == 2
    assert sh.get_index(2, 2) == 8
    # constant function reconstruction
    coeff = np.zeros(9, np.float32)
    coeff[0] = 1.0
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    val = float(sh.evaluate_sum(d, jnp.asarray(coeff))[0])
    np.testing.assert_allclose(val, 0.28209479, atol=1e-6)
