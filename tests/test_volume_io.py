"""Volume container + .cvol IO tests (reference: renderer/volume.h:42-77
format spec; unittests/testEnsemble.cpp filename mapping)."""
import os

import numpy as np
import pytest

from fvsrn_tpu.volume import lz4io
from fvsrn_tpu.volume.ensemble import LRUCache, VolumeEnsembleFactory
from fvsrn_tpu.volume.volume import (
    DTYPE_FLOAT, DTYPE_UCHAR, Feature, MipmapLevel, Volume)


def test_cvol_roundtrip_uncompressed(tmp_path, rng):
    v = Volume(world_size=(1.0, 2.0, 3.0))
    v.add_feature("density",
                  rng.random((4, 5, 6, 1)).astype(np.float32))
    v.add_feature("velocity",
                  rng.random((4, 5, 6, 3)).astype(np.float32))
    p = str(tmp_path / "test.cvol")
    v.save(p)
    v2 = Volume.load(p)
    assert v2.world_size == (1.0, 2.0, 3.0)
    assert [f.name for f in v2.features] == ["density", "velocity"]
    np.testing.assert_array_equal(v2.features[0].levels[0].data,
                                  v.features[0].levels[0].data)
    np.testing.assert_array_equal(v2.features[1].levels[0].data,
                                  v.features[1].levels[0].data)


def test_cvol_roundtrip_compressed(tmp_path, rng):
    if not lz4io.available():
        pytest.skip("native LZ4 unavailable")
    # quantized data has byte-level repeats for LZ4 to find
    x = np.linspace(0, 1, 32 * 32 * 32, dtype=np.float32)
    data = (np.round(x * 15) * 16).astype(np.uint8).reshape(32, 32, 32)[..., None]
    v = Volume()
    v.add_feature("density", data)
    p = str(tmp_path / "c.cvol")
    pu = str(tmp_path / "u.cvol")
    v.save(p, compression=1)
    v.save(pu, compression=0)
    assert os.path.getsize(p) < os.path.getsize(pu)
    v2 = Volume.load(p)
    np.testing.assert_array_equal(v2.features[0].levels[0].data, data)


def test_cvol_uchar_dtype(tmp_path, rng):
    data = rng.integers(0, 255, (4, 4, 4, 1)).astype(np.uint8)
    v = Volume()
    v.add_feature("density", data)
    p = str(tmp_path / "u8.cvol")
    v.save(p)
    v2 = Volume.load(p)
    assert v2.features[0].dtype_code == DTYPE_UCHAR
    np.testing.assert_array_equal(v2.features[0].levels[0].data, data)
    # to_tensor normalizes to [0,1]
    t = v2.features[0].levels[0].to_tensor()
    assert t.max() <= 1.0


def test_tensor_roundtrip(rng):
    data = rng.random((3, 4, 5, 2)).astype(np.float32)
    lvl = MipmapLevel(data.copy())
    t = lvl.to_tensor()
    assert t.shape == (2, 5, 4, 3)  # (C, X, Y, Z)
    lvl.from_tensor(t)
    np.testing.assert_allclose(lvl.data, data, atol=1e-6)


def test_implicit_dataset_and_histogram():
    v = Volume.create_implicit_dataset(17, "SPHERE")
    assert v.density.shape == (17, 17, 17)
    np.testing.assert_allclose(v.density[8, 8, 8], 1.0, atol=1e-5)
    counts, lo, hi = v.histogram(bins=64)
    assert counts.sum() == 17 ** 3
    assert lo < hi


def test_mipmaps(rng):
    v = Volume()
    v.add_feature("density", rng.random((8, 8, 8, 1)).astype(np.float32))
    f = v.features[0]
    f.create_mipmap_level(1, "average")  # size 8//2 = 4
    assert f.levels[1].size_x == 4
    # average of a constant field stays constant
    v2 = Volume()
    v2.add_feature("density", np.full((8, 8, 8, 1), 0.25, np.float32))
    v2.features[0].create_mipmap_level(3)
    np.testing.assert_allclose(v2.features[0].levels[3].data, 0.25,
                               atol=1e-6)
    f.create_mipmap_level(2, "halton")
    assert f.levels[2].size_x == 2
    f.delete_all_mipmap_levels()
    assert len(f.levels) == 1


def test_lru_cache():
    c = LRUCache(2)
    loads = []
    loader = lambda k: loads.append(k) or k * 10
    assert c.get_or_load(1, loader) == 10
    assert c.get_or_load(2, loader) == 20
    assert c.get_or_load(1, loader) == 10  # cached
    assert loads == [1, 2]
    c.get_or_load(3, loader)  # evicts 2 (LRU)
    c.get_or_load(2, loader)
    assert loads == [1, 2, 3, 2]


def test_ensemble_factory(tmp_path, rng):
    # write two member volumes
    for e in range(2):
        for t in range(2):
            v = Volume()
            v.add_feature("density", np.full((2, 2, 2, 1),
                                             e * 10 + t, np.float32))
            v.save(str(tmp_path / f"vol_e{e:03d}_t{t:02d}.cvol"))
    fac = VolumeEnsembleFactory(
        format_string="vol_e%03d_t%02d.cvol", num_ensembles=2,
        num_timesteps=2, root=str(tmp_path))
    fn = fac.get_volume_filename(1, 0)
    assert fn.endswith("vol_e001_t00.cvol")
    v = fac.load_volume(1, 1)
    np.testing.assert_allclose(v.density, 11.0)
    assert fac.load_volume(1, 1) is v  # cache hit
    with pytest.raises(IndexError):
        fac.get_volume_filename(2, 0)


def test_ensemble_factory_json_roundtrip(tmp_path):
    fac = VolumeEnsembleFactory(format_string="v%d_%d.cvol",
                                num_ensembles=3, num_timesteps=7,
                                start_timestep=2, step_timestep=3)
    p = str(tmp_path / "fac.json")
    fac.save(p)
    fac2 = VolumeEnsembleFactory.from_file(p)
    assert fac2.num_ensembles == 3
    assert fac2.num_timesteps == 7
    assert fac2.start_timestep == 2
    assert fac2.step_timestep == 3


def test_lz4cpp_dictionary_continuation(tmp_path):
    """Chunks that back-reference the previous chunk's output (the
    reference's streaming compression) decode correctly: a handcrafted
    block whose match offset reaches into the prefix window."""
    from fvsrn_tpu.volume import lz4io
    if not lz4io.available():
        import pytest
        pytest.skip("native codec unavailable")
    prefix = b"ABCDEFGH" * 4  # 32 B of already-decoded output
    # block: [token: 0 literals, matchlen 8 -> 0x04][offset 32 LE]
    #        [last sequence: 5 literals]
    block = bytes([0x04, 32, 0]) + bytes([0x50]) + b"WXYZV"
    out = np.empty(len(prefix) + 13, np.uint8)
    out[:len(prefix)] = np.frombuffer(prefix, np.uint8)
    n = lz4io.decompress_into(block, out, len(prefix))
    assert n == 13
    got = out[len(prefix):len(prefix) + 13].tobytes()
    assert got == prefix[:8] + b"WXYZV"


def test_round1_framing_fallback(tmp_path):
    """Files written with the round-1 chunk framing still load."""
    import struct
    from fvsrn_tpu.volume import lz4io
    from fvsrn_tpu.volume.volume import Volume
    if not lz4io.available():
        import pytest
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(0)
    data = (rng.random((7, 8, 9)) < 0.2).astype(np.float32)
    v = Volume(world_size=(1.0, 1.0, 1.0))
    v.add_feature("density", data)
    p = str(tmp_path / "old.cvol")
    # write v1 header + round-1 chunk framing by hand
    payload = v.features[0].levels[0].data.tobytes()
    with open(p, "wb") as s:
        s.write(b"CVOL")
        s.write(struct.pack("<i", 1))
        s.write(struct.pack("<3f", 1, 1, 1))
        s.write(struct.pack("<i", 1))
        s.write(struct.pack("<i", 1))  # FLAG_COMPRESSED
        s.write(b"\x00" * 4)
        name = v.features[0].name.encode()
        s.write(struct.pack("<i", len(name)))
        s.write(name)
        lvl = v.features[0].levels[0]
        s.write(struct.pack("<3Q", lvl.size_x, lvl.size_y, lvl.size_z))
        s.write(struct.pack("<i", lvl.channels))
        s.write(struct.pack("<i", v.features[0].dtype_code))
        chunk = 1 << 20
        for off in range(0, len(payload), chunk):
            raw = payload[off:off + chunk]
            comp = lz4io.compress(raw)
            s.write(struct.pack("<ii", len(raw), len(comp)))
            s.write(comp)
    v2 = Volume.load(p)
    np.testing.assert_array_equal(
        v2.features[0].levels[0].data, v.features[0].levels[0].data)
