"""Scene-config registry tests (reference: module_registry.cpp loadTree;
fixture schema of applications/config-files/*.json)."""
import os

import numpy as np
import pytest

from fvsrn_tpu.modules.registry import load_from_json

_SCENE = {
    "ImageEvaluator": {"Simple": {
        "selectedCamera": "Sphere", "selectedRayEvaluator": "DVR",
        "selectedVolume": "Implicit", "samplesPerIterationLog2": 0,
    }},
    "RayEvaluation": {
        "DVR": {"stepsize": 0.01, "minDensity": 0.1, "maxDensity": 1.0,
                "earlyOut": True, "selectedTF": "Piecewise",
                "selectedBRDF": "Lambert"},
        "Iso": {"isovalue": 0.455, "stepsize": 0.001},
        "MonteCarlo": {"minDensity": 0.0, "maxDensity": 1.0,
                       "lightRadius": 0.1, "lightIntensity": 2.0,
                       "colorScaling": 1.0, "numBounces": 3,
                       "selectedPhaseFunction": ""},
    },
    "blending": {"blending": {"blending": "BeerLambert"}},
    "brdf": {"Lambert": {"enablePhong": False,
                         "enableMagnitudeScaling": False}},
    "camera": {"Sphere": {
        "center": [0.0, 0.0, 0.0], "distance": 1.95,
        "fovY": 0.7853981633974483, "orientation": "Zm",
        "pitch": 0.45, "yaw": 5.38}},
    "phase": {"Henyey-Greenstein": {"g": 0.3}, "Rayleigh": {}},
    "root": "Simple",
    "tf": {
        "Identity": {"absorptionScaling": 10.0, "emissionScaling": 1.0},
        "Piecewise": {
            "absorptionScaling": 10.0,
            "colorPoints": [[0.0, 1.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]],
            "opacityPoints": [[0.0, 0.0], [0.5, 0.2], [1.0, 1.0]]},
        "Gaussian": {
            "absorptionScaling": 5.0,
            "points": [[1.0, 0.2, 0.2, 0.6, 0.7, 0.05]],
            "scaleWithGradient": False,
            "usePiecewiseAnalyticIntegration": False},
    },
    "volume": {"Implicit": {"function": "Barth"}, "SRN": {}},
}


def test_load_scene_dict():
    sc = load_from_json(_SCENE)
    assert sc.selected["ray"] == "DVR"
    assert sc.evaluator.camera.orientation == "Zm"
    np.testing.assert_allclose(
        float(np.asarray(sc.evaluator.camera.pitch_yaw_distance)[2]),
        1.95)
    assert sc.evaluator.volume.equation == "BARTH"
    # piecewise TF: merged positions, opacity scaled by 10
    t = np.asarray(sc.evaluator.tf.tensor)
    assert t.shape[1] == 5
    np.testing.assert_allclose(t[-1, 3], 10.0)
    np.testing.assert_allclose(
        float(np.asarray(sc.evaluator.ray_config.stepsize)), 0.01,
        rtol=1e-6)
    np.testing.assert_allclose(
        float(np.asarray(sc.evaluator.ray_config.density_min)), 0.1,
        rtol=1e-6)
    # MC block parsed
    assert sc.mc_config is not None
    assert sc.mc_config.num_bounces == 3
    np.testing.assert_allclose(float(np.asarray(sc.phase.g)), 0.3, rtol=1e-6)
    # iso evaluator present
    assert "Iso" in sc.ray_evaluators


def test_scene_renders():
    sc = load_from_json(_SCENE)
    img = sc.evaluator.render(16, 16, max_steps=128)
    a = np.asarray(img)
    assert a.shape == (1, 8, 16, 16)
    assert np.isfinite(a).all()


def test_reference_fixture_compatibility():
    """The actual reference scene files parse (when the reference tree is
    mounted); proves drop-in config compatibility."""
    path = "/root/reference/applications/config-files/implicit-Barth.json"
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    sc = load_from_json(path)
    assert sc.evaluator.volume is not None
    assert sc.evaluator.volume.equation == "BARTH"
    assert sc.evaluator.camera is not None
    assert sc.evaluator.tf is not None
    img = sc.evaluator.render(24, 24, max_steps=600)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    # the BRDF requests gradients (magnitude scaling); without normals the
    # image is empty -- regression check for the volumeShouldProvideNormals
    # plumbing
    assert a[:, 3].max() > 0.5


def test_volume_override():
    from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit
    vol = VolumeInterpolationImplicit.make("SPHERE")
    sc = load_from_json(_SCENE, volume_override=vol)
    assert sc.evaluator.volume.equation == "SPHERE"
