"""Inference / export / checkpoint tests (reference: inference.py
LoadedModel; volnet binary round-trip per testSRN.cpp:413-430)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fvsrn_tpu.inference import LoadedModel, compare_modes
from fvsrn_tpu.models.export import (
    ENCODING_BYTE_GAUSSIAN, ENCODING_BYTE_LINEAR, load_volnet, save_volnet)
from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.srn import SceneRepresentationNetwork
from fvsrn_tpu.raytracer.dvr import RayEvaluationSteppingDvr
from fvsrn_tpu.camera import CameraOnASphere
from fvsrn_tpu.train.checkpoints import (RunCheckpoint, load_state,
                                         save_state)
from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def _net(with_latent=True, seed=3):
    rng = np.random.default_rng(seed)
    latent = LatentSpace(static_grid=(
        rng.standard_normal((8, 6, 6, 6)) * 0.2).astype(np.float32)) \
        if with_latent else LatentSpace()
    return SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=6,
        output_mode="density:direct", latent=latent, seed=seed)


def test_volnet_roundtrip(tmp_path, rng):
    net = _net()
    p = str(tmp_path / "net.volnet")
    save_volnet(net, p, box_min=(-1, -2, -3), box_size=(2, 4, 6))
    net2, bmin, bsize = load_volnet(p)
    np.testing.assert_allclose(bmin, [-1, -2, -3])
    np.testing.assert_allclose(bsize, [2, 4, 6])
    assert net2.output_mode == net.output_mode
    assert len(net2.layers) == len(net.layers)
    assert net2.layers[0].activation == "SnakeAlt"
    assert net2.layers[0].activation_param == 2.0
    # fp16 storage: weights match to half precision
    np.testing.assert_allclose(
        np.asarray(net2.layers[0].weight),
        np.asarray(net.layers[0].weight), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(net2.latent.static_grid),
        np.asarray(net.latent.static_grid), atol=1e-6)
    # forward equality at half precision
    x = jnp.asarray(rng.random((32, 3)), jnp.float32)
    y1 = np.asarray(net(x))
    y2 = np.asarray(net2(x))
    np.testing.assert_allclose(y1, y2, atol=1e-2)


@pytest.mark.parametrize("encoding", [ENCODING_BYTE_LINEAR,
                                      ENCODING_BYTE_GAUSSIAN])
def test_volnet_byte_encodings(tmp_path, encoding):
    net = _net()
    p = str(tmp_path / "net.volnet")
    save_volnet(net, p, grid_encoding=encoding)
    net2, _, _ = load_volnet(p)
    g1 = np.asarray(net.latent.static_grid)
    g2 = np.asarray(net2.latent.static_grid)
    # byte quantization: coarse but correlated (reference reports the
    # encoding error on export, network.py:812-875)
    err = np.abs(g1 - g2).mean() / (np.abs(g1).mean() + 1e-8)
    assert err < 0.2


def test_run_checkpoint_roundtrip(tmp_path):
    net = _net(with_latent=False)
    p = str(tmp_path / "run.hdf5")
    with RunCheckpoint(p) as ck:
        ck.set_options({"layers": "32:32", "lr": 0.01,
                        "extra": {"a": 1}})
        ck.append_losses(0, {"l1": 0.5, "total": 0.7}, 1.25)
        ck.append_losses(1, {"l1": 0.4, "total": 0.6}, 1.5)
        ck.save_weights(net, 1)
    with RunCheckpoint(p, "r") as ck:
        assert ck.get_options()["lr"] == 0.01
        np.testing.assert_allclose(ck.get_losses("l1"), [0.5, 0.4])
        assert ck.epochs_with_weights() == [1]
        net2 = ck.load_weights()
    x = jnp.asarray(np.random.default_rng(0).random((8, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(net(x)), np.asarray(net2(x)),
                               atol=1e-6)


def test_save_load_state(tmp_path):
    net = _net(with_latent=False)
    p = str(tmp_path / "state.pkl")
    save_state(p, net, opt_state=None, extra={"epoch": 7})
    net2, opt2, extra = load_state(p)
    assert extra["epoch"] == 7
    assert opt2 is None
    for a, b in zip(jax.tree.leaves(net), jax.tree.leaves(net2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loaded_model_modes_agree():
    net = _net()
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.2, 0.1], [0.2, 0.9, 0.5]],
        opacity=[0.0, 25.0], positions=[0.0, 1.0])
    model = LoadedModel(net, tf,
                        config=RayEvaluationSteppingDvr.make(
                            stepsize=1 / 32, enable_early_out=False))
    cam = CameraOnASphere.make(pitch=0.4, yaw=0.7, distance=1.6)
    # note: FUSED on CPU tests would need interpret mode; compare the
    # plain modes here (fused-vs-plain equality is covered in test_fused)
    img32 = np.asarray(model.render_network(cam, 16, 16, "PLAIN32"))
    img16 = np.asarray(model.render_network(cam, 16, 16, "PLAIN16"))
    assert img32.shape == (16, 16, 4)
    assert np.isfinite(img32).all()
    np.testing.assert_allclose(img16, img32, atol=0.15)
    assert np.abs(img16 - img32).mean() < 0.02


def test_render_reference_and_timing():
    vol = VolumeInterpolationImplicit.make("SPHERE")
    net = _net(with_latent=False)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1.0, 0.5, 0.2], [1.0, 1.0, 0.5]],
        opacity=[0.0, 30.0], positions=[0.0, 1.0])
    model = LoadedModel(net, tf, reference_volume=vol,
                        config=RayEvaluationSteppingDvr.make(
                            stepsize=1 / 24))
    cam = CameraOnASphere.make(distance=1.5)
    ref = np.asarray(model.render_reference(cam, 16, 16))
    assert ref[..., 3].max() > 0.5
    mean_ms, std_ms, frames = model.time_rendering(
        LoadedModel.rotation_cameras(3), width=8, height=8,
        mode="PLAIN32")
    assert mean_ms > 0 and len(frames) == 2  # first frame discarded


def test_render_network_fused_boxfeat_bucketed():
    """The FUSED inference mode rides the boxfeat+bucketed fast path and
    matches the lattice-sampling oracle (interpret mode off-TPU)."""
    import jax.numpy as jnp
    from fvsrn_tpu.camera import camera_matrix, generate_rays
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                         max_steps_bound, trace_dvr)
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear

    rng = np.random.default_rng(3)
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((8, 8, 8, 8)) * 0.3).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=6,
        output_mode="density:direct", latent=latent, seed=3)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.2, 0.1], [0.1, 0.9, 0.4]], opacity=[3.0, 20.0],
        positions=[0.0, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 32,
                                        enable_early_out=False)
    model = LoadedModel(net, tf, config=cfg)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.7, distance=1.6)
    w = h = 32
    img = np.asarray(model.render_network(cam, w, h, "FUSED",
                                          interpret=True))
    assert img.shape == (h, w, 4) and np.isfinite(img).all()
    # oracle: plain lattice-mode trace (the boxfeat sampling contract)
    mat = np.asarray(camera_matrix(cam))
    rs, rd = generate_rays(mat, w, h, cam.fov_y_radians)
    vol = VolumeInterpolationNetwork.make(net)
    steps = max_steps_bound((1.0, 1.0, 1.0), 1 / 32)
    ref = np.asarray(trace_dvr(rs.reshape(-1, 3), rd.reshape(-1, 3),
                               vol, tf, cfg, steps, lattice=True).color
                     ).reshape(h, w, 4)
    assert ref[..., 3].max() > 0.3
    np.testing.assert_allclose(img, ref, atol=1e-4)


def test_render_network_iso():
    """SRN isosurface rendering: FUSED (interpret) matches PLAIN32."""
    import jax.numpy as jnp
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.raytracer.iso import RayEvaluationSteppingIso
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear

    rng = np.random.default_rng(7)
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=6,
        output_mode="density", latent=latent, seed=7)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[1.0, 1.0, 1.0]] * 2, opacity=[0.0, 10.0],
        positions=[0.0, 1.0])
    model = LoadedModel(net, tf)
    cfg = RayEvaluationSteppingIso.make(stepsize=1 / 32, isovalue=0.5,
                                        binary_search_steps=6)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.6, distance=1.6)
    a = np.asarray(model.render_network_iso(cam, 16, 16, cfg, "FUSED",
                                            interpret=True))
    b = np.asarray(model.render_network_iso(cam, 16, 16, cfg, "PLAIN32"))
    assert np.isfinite(a).all()
    assert (b[..., 3] > 0.5).sum() > 10
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_render_network_texture_tf():
    """FUSED inference with a texture TF (and its 1D-preintegrated
    variant) matches the plain path (interpret, lattice oracle)."""
    import jax.numpy as jnp
    from fvsrn_tpu.camera import camera_matrix, generate_rays
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                         max_steps_bound, trace_dvr)
    from fvsrn_tpu.transfer import TransferFunctionTexture

    rng = np.random.default_rng(5)
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((8, 8, 8, 8)) * 0.3).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="32:32", activation="SnakeAlt:2", num_fourier=6,
        output_mode="density", latent=latent, seed=5)
    tbl = rng.random((64, 4)).astype(np.float32)
    tbl[:, 3] *= 20.0
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 32,
                                        enable_early_out=False)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.7, distance=1.6)
    w = h = 32
    mat = np.asarray(camera_matrix(cam))
    rs, rd = generate_rays(mat, w, h, cam.fov_y_radians)
    vol = VolumeInterpolationNetwork.make(net)
    steps = max_steps_bound((1.0, 1.0, 1.0), 1 / 32)
    for pre in (False, True):
        tf = TransferFunctionTexture(tensor=jnp.asarray(tbl))
        if pre:
            tf = tf.with_preintegration(resolution=128)
        model = LoadedModel(net, tf, config=cfg)
        # kernel-exactness contract: f32 table, no estimate-based clip
        img = np.asarray(model.render_network(
            cam, w, h, "FUSED", interpret=True,
            saturation_clip=False, table_dtype=jnp.float32))
        ref = np.asarray(trace_dvr(
            rs.reshape(-1, 3), rd.reshape(-1, 3), vol, tf, cfg, steps,
            lattice=True).color).reshape(h, w, 4)
        assert ref[..., 3].max() > 0.5
        # 1e-3: the preintegration near-branch (|d - prev| < 1e-3
        # selector) amplifies the kernel trig's ~1e-5 density deltas on
        # isolated samples; still 10x inside the fp16-grade contract
        # (testSRN.cpp:405-411 |delta| < 1e-2)
        np.testing.assert_allclose(img, ref, atol=1e-3,
                                   err_msg=f"pre={pre}")
        # product defaults (bf16 table + saturation clip): same image
        # up to the early-out/storage-rounding tolerance class
        img_d = np.asarray(model.render_network(cam, w, h, "FUSED",
                                                interpret=True))
        np.testing.assert_allclose(img_d, ref, atol=5e-3,
                                   err_msg=f"pre={pre} defaults")


def test_render_network_occupancy_culling_zero_band_tf():
    """Product-path TF-occupancy culling: with a zero-band TF the
    fused render auto-builds the macrocell grid and culls transparent
    segments; the image stays within the alpha_skip bound of the
    unculled render. Ramp TFs skip the bounding pass entirely
    (the round-4 measured no-op)."""
    import jax.numpy as jnp
    from fvsrn_tpu.inference import LoadedModel
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.raytracer.dvr import RayEvaluationSteppingDvr
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear

    rng = np.random.default_rng(8)
    latent = LatentSpace(static_grid=jnp.asarray(
        (rng.standard_normal((8, 8, 8, 8)) * 0.3).astype(np.float32)))
    net = SceneRepresentationNetwork.make(
        layers="16:16", activation="SnakeAlt:2", num_fourier=4,
        output_mode="density", latent=latent, seed=8)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9],
             [0.9, 0.9, 0.1]],
        opacity=[0.0, 0.0, 20.0, 30.0],
        positions=[0.0, 0.5, 0.75, 1.0])
    cfg = RayEvaluationSteppingDvr.make(stepsize=1 / 32,
                                        enable_early_out=False)
    model = LoadedModel(net, tf, config=cfg)
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.7, distance=1.6)
    img_off = np.asarray(model.render_network(
        cam, 32, 32, "FUSED", interpret=True, saturation_clip=False,
        occupancy_culling=False, table_dtype=jnp.float32))
    img_on = np.asarray(model.render_network(
        cam, 32, 32, "FUSED", interpret=True, saturation_clip=False,
        occupancy_culling=True, table_dtype=jnp.float32))
    assert model._occ_cache and list(model._occ_cache.values())[0] \
        is not None
    assert np.abs(img_on - img_off).max() < 60 * 1e-5 + 2e-3

    # ramp TF: the cheap probe skips the bounding pass (cache -> None)
    tf2 = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.9, 0.4, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 10.0, 30.0], positions=[0.0, 0.5, 1.0])
    model2 = LoadedModel(net, tf2, config=cfg)
    _ = model2.render_network(cam, 32, 32, "FUSED", interpret=True,
                              saturation_clip=False,
                              table_dtype=jnp.float32)
    assert list(model2._occ_cache.values()) == [None]
