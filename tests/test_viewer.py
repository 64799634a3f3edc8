"""Browser viewer (the reference GUI's headless equivalent,
gui/visualizer.cpp): HTTP surface + PNG rendering."""
import urllib.request

import numpy as np

import fvsrn_tpu as fv


def _evaluator():
    vol = fv.VolumeInterpolationImplicit.make("SPHERE")
    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.2, 0.1], [1.0, 1.0, 0.6]], opacity=[0.0, 25.0],
        positions=[0.0, 1.0])
    cfg = fv.RayEvaluationSteppingDvr.make(stepsize=1 / 32)
    cam = fv.CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    return fv.ImageEvaluatorSimple(camera=cam, volume=vol, tf=tf,
                                   ray_config=cfg)


def test_viewer_serves_page_and_render():
    from fvsrn_tpu.viewer import serve
    server = serve(_evaluator(), port=0, block=False)
    try:
        base = f"http://127.0.0.1:{server.server_port}"
        page = urllib.request.urlopen(f"{base}/", timeout=30).read()
        assert b"fvsrn_tpu viewer" in page
        png = urllib.request.urlopen(
            f"{base}/render?size=64&pitch=0.3&yaw=0.5&distance=1.6",
            timeout=120).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # orbit + opacity edit produce a different image
        png2 = urllib.request.urlopen(
            f"{base}/render?size=64&pitch=0.3&yaw=2.5&distance=1.6"
            f"&opacity=0.3", timeout=120).read()
        assert png2[:8] == b"\x89PNG\r\n\x1a\n" and png2 != png
    finally:
        server.shutdown()


def test_viewer_png_fallback_encoder():
    """The no-PIL PNG writer emits decodable files."""
    from PIL import Image
    import io
    from fvsrn_tpu.viewer import _encode_png
    rng = np.random.default_rng(0)
    arr = (rng.random((17, 23, 3)) * 255).astype(np.uint8)
    png = _encode_png(arr)
    back = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
    np.testing.assert_array_equal(back, arr)


def test_viewer_progressive_mc():
    """MC evaluators refine progressively across same-camera requests
    (reference: the GUI's refine loop, iimage_evaluator.h:43-71): the
    /meta endpoint flags progressive mode, X-Frames counts accumulated
    passes, and a camera change resets the accumulator."""
    import json

    from fvsrn_tpu.phase import PhaseFunctionHenyeyGreenstein
    from fvsrn_tpu.raytracer.montecarlo import RayEvaluationMonteCarlo
    from fvsrn_tpu.viewer import serve
    vol = fv.VolumeInterpolationImplicit.make("SPHERE")
    tf = fv.TransferFunctionIdentity.make(absorption=8.0, emission=1.0)
    cfg = RayEvaluationMonteCarlo.make(max_absorption=8.0,
                                       density_min=0.3, num_bounces=1,
                                       max_iterations=32)
    cam = fv.CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    ev = fv.ImageEvaluatorSimple(
        camera=cam, volume=vol, tf=tf, ray_config=cfg,
        phase=PhaseFunctionHenyeyGreenstein.make(g=0.0), ray_mode="mc")
    server = serve(ev, port=0, block=False)
    try:
        base = f"http://127.0.0.1:{server.server_port}"
        meta = json.loads(urllib.request.urlopen(
            f"{base}/meta", timeout=30).read())
        assert meta["progressive"] is True
        url = f"{base}/render?size=16&pitch=0.3&yaw=0.5&distance=1.6"
        r1 = urllib.request.urlopen(url, timeout=300)
        assert r1.headers["X-Frames"] == "1"
        r2 = urllib.request.urlopen(url, timeout=300)
        assert r2.headers["X-Frames"] == "2"
        # camera change resets the accumulation
        r3 = urllib.request.urlopen(
            f"{base}/render?size=16&pitch=0.3&yaw=2.0&distance=1.6",
            timeout=300)
        assert r3.headers["X-Frames"] == "1"
    finally:
        server.shutdown()
