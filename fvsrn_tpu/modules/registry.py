"""Scene-config registry: build module trees from the reference's JSON.

Rebuild of ``ModuleRegistry`` + per-module load/save
(reference: renderer/module_registry.cpp:26-305 ``loadTree``/``loadAll``,
exposed as ``pyrenderer.load_from_json`` bindings at
module_registry.cpp:75-99). The same scene-config JSONs that drive the
reference (applications/config-files/*.json) resolve here into this
framework's pytree modules, preserving the two-tier config system of the
reference (scene JSON for the module tree, argparse/dataclasses for
training).
"""
from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from ..brdf import BRDFLambert
from ..camera import CameraOnASphere
from ..phase import PhaseFunctionHenyeyGreenstein, PhaseFunctionRayleigh
from ..raytracer.dvr import RayEvaluationSteppingDvr
from ..raytracer.evaluator import ImageEvaluatorSimple
from ..raytracer.iso import RayEvaluationSteppingIso
from ..raytracer.montecarlo import RayEvaluationMonteCarlo
from ..transfer import (TransferFunctionGaussian, TransferFunctionIdentity,
                        TransferFunctionPiecewiseLinear,
                        TransferFunctionTexture)
from ..volume.grid import VolumeInterpolationGrid
from ..volume.implicit import IMPLICIT_EQUATIONS, VolumeInterpolationImplicit


@dataclass
class SceneConfig:
    """The resolved module tree of one scene JSON."""
    evaluator: ImageEvaluatorSimple
    cameras: dict
    volumes: dict
    tfs: dict
    ray_evaluators: dict
    brdf: Any = None
    phase: Any = None
    mc_config: Optional[RayEvaluationMonteCarlo] = None
    raw: dict = field(default_factory=dict)
    selected: dict = field(default_factory=dict)


def _camel_to_const(name: str) -> str:
    s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", name).upper()
    return s


def _load_camera(j: dict) -> CameraOnASphere:
    """(reference: camera.cpp CameraOnASphere::load)"""
    return CameraOnASphere.make(
        center=tuple(j.get("center", (0, 0, 0))),
        pitch=j.get("pitch", 0.0), yaw=j.get("yaw", 0.0),
        distance=j.get("distance", 1.0),
        orientation=j.get("orientation", "Ym"),
        fov_y_radians=j.get("fovY", 0.7853981633974483))


def _load_tf(kind: str, j: dict):
    scale = j.get("absorptionScaling", 1.0)
    if kind == "Identity":
        return TransferFunctionIdentity.make(
            absorption=scale, emission=j.get("emissionScaling", 1.0))
    if kind == "Gaussian":
        pts = np.asarray(j.get("points", []), np.float32)
        if pts.size == 0:
            return None
        # JSON rows: (r, g, b, opacity, mean, variance)
        tensor = pts.copy()
        tensor[:, 3] *= scale
        return TransferFunctionGaussian(
            tensor=tensor,
            analytic=j.get("usePiecewiseAnalyticIntegration", False),
            scale_with_gradient=j.get("scaleWithGradient", False))
    if kind == "Piecewise":
        color_pts = np.asarray(j.get("colorPoints", []), np.float32)
        opacity_pts = np.asarray(j.get("opacityPoints", []), np.float32)
        if color_pts.size == 0 or opacity_pts.size == 0:
            return None
        # colorPoints rows (pos, r, g, b); opacityPoints rows (pos, o):
        # merge on the union of positions (reference:
        # TransferFunctionPiecewiseLinear::computeTensor)
        pos = np.unique(np.concatenate([color_pts[:, 0],
                                        opacity_pts[:, 0]]))
        rgb = np.stack([np.interp(pos, color_pts[:, 0], color_pts[:, k])
                        for k in (1, 2, 3)], axis=1)
        opacity = np.interp(pos, opacity_pts[:, 0],
                            opacity_pts[:, 1]) * scale
        return TransferFunctionPiecewiseLinear.make(rgb, opacity, pos)
    if kind == "Texture":
        color_pts = np.asarray(j.get("colorPoints", []), np.float32)
        opacity = np.asarray(j.get("opacityPoints", []), np.float32)
        if color_pts.size == 0 or opacity.size == 0:
            return None
        r = len(opacity)
        centers = (np.arange(r) + 0.5) / r
        rgb = np.stack([np.interp(centers, color_pts[:, 0],
                                  color_pts[:, k]) for k in (1, 2, 3)],
                       axis=1)
        tensor = np.concatenate(
            [rgb, (opacity * scale)[:, None]], axis=1).astype(np.float32)
        return TransferFunctionTexture(tensor=tensor)
    return None


def _load_volume(kind: str, j: dict, base_dir: str):
    if kind == "Implicit":
        fn = j.get("function", "Sphere")
        const = _camel_to_const(fn)
        if const not in IMPLICIT_EQUATIONS:
            raise ValueError(f"unknown implicit function {fn}")
        return VolumeInterpolationImplicit.make(const)
    if kind == "Grid":
        if j.get("source") != "VOLUME":
            return None
        path = j.get("volumePath", "")
        if not os.path.isabs(path):
            path = os.path.join(base_dir, path)
        if not os.path.exists(path):
            return None  # dataset not present; caller may override
        from ..volume.volume import Volume
        vol = Volume.load(path)
        interp = {"NEAREST_NEIGHBOR": "nearest",
                  "TRILINEAR": "trilinear",
                  "TRICUBIC": "tricubic"}.get(
            j.get("interpolation", "TRILINEAR"), "trilinear")
        ws = vol.world_size
        return VolumeInterpolationGrid.from_grid(
            vol.density, interpolation=interp,
            box_size=np.asarray(ws, np.float64)
            / max(max(ws), 1e-8),
            box_min=None)
    return None


def load_from_json(path_or_dict, volume_override=None) -> SceneConfig:
    """Resolve a scene JSON into modules
    (reference: pyrenderer.load_from_json, module_registry.cpp:75-99).

    ``volume_override`` substitutes the selected volume (the training
    stack swaps volumes under a fixed camera/TF config, reference:
    applications/volnet/input_data.py:201-237).
    """
    if isinstance(path_or_dict, dict):
        j = path_or_dict
        base_dir = os.getcwd()
    else:
        with open(path_or_dict) as f:
            j = json.load(f)
        base_dir = os.path.dirname(os.path.abspath(path_or_dict))

    cameras = {name: _load_camera(cj)
               for name, cj in j.get("camera", {}).items()}
    tfs = {}
    for name, tj in j.get("tf", {}).items():
        tf = _load_tf(name, tj)
        if tf is not None:
            tfs[name] = tf
    volumes = {}
    for name, vj in j.get("volume", {}).items():
        try:
            v = _load_volume(name, vj, base_dir)
        except ValueError:
            v = None
        if v is not None:
            volumes[name] = v

    blend = j.get("blending", {}).get("blending", {}) \
        .get("blending", "BeerLambert")
    blend_mode = "beer_lambert" if blend == "BeerLambert" else "alpha"

    brdf_j = j.get("brdf", {}).get("Lambert", {})
    brdf = BRDFLambert.make(
        enable_phong=brdf_j.get("enablePhong", False),
        enable_magnitude_scaling=brdf_j.get("enableMagnitudeScaling",
                                            False),
        magnitude_scaling=brdf_j.get("magnitudeScaling", 1.0),
        ambient=brdf_j.get("ambient", 0.0),
        specular=brdf_j.get("specular", 0.0),
        magnitude_center=brdf_j.get("magnitudeCenter", 0.0),
        magnitude_radius=brdf_j.get("magnitudeRadius", 0.0),
        light=tuple(brdf_j.get("lightDirection", (0, 0, -1)))
        if brdf_j.get("lightType", "Directional") == "Directional"
        else tuple(brdf_j.get("lightPosition", (0, 0, 1))),
        light_type="direction"
        if brdf_j.get("lightType", "Directional") == "Directional"
        else "point",
        specular_exponent=int(brdf_j.get("specularExponent", 8)))

    # normals are required when the BRDF shades or scales by the
    # gradient, or a TF is gradient-modulated -- the reference's
    # GlobalSettings::volumeShouldProvideNormals plumbing
    # (reference: imodule.h:311-359, prepareRendering)
    need_normals = bool(brdf.enable_phong
                        or brdf.enable_magnitude_scaling
                        or any(getattr(tf, "scale_with_gradient", False)
                               for tf in tfs.values()))

    ray_evaluators = {}
    rj = j.get("RayEvaluation", {})
    # object-space stepsizes are voxels; world = objspace / max resolution
    # (reference: ray_evaluation_stepping.h getStepsizeWorld)
    def _world_step(d, default=1 / 256):
        s = d.get("stepsize", default)
        if d.get("stepsizeIsObjectSpace", False):
            res = 256
            for v in volumes.values():
                if hasattr(v, "resolution"):
                    res = max(v.resolution)
            s = s / res if s > 1 else s  # voxel-count stepsizes only
        return s

    if "DVR" in rj:
        d = rj["DVR"]
        ray_evaluators["DVR"] = RayEvaluationSteppingDvr.make(
            stepsize=_world_step(d),
            density_min=d.get("minDensity", 0.0),
            density_max=d.get("maxDensity", 1.0),
            enable_early_out=d.get("earlyOut", True),
            blend_mode=blend_mode,
            need_normals=need_normals)
    if "Iso" in rj:
        d = rj["Iso"]
        ray_evaluators["Iso"] = RayEvaluationSteppingIso.make(
            stepsize=d.get("stepsize", 1 / 256),
            isovalue=d.get("isovalue", 0.5))
    mc_config = None
    phase = None
    if "MonteCarlo" in rj:
        d = rj["MonteCarlo"]
        mc_config = RayEvaluationMonteCarlo.make(
            density_min=d.get("minDensity", 0.0),
            density_max=d.get("maxDensity", 1.0),
            light_radius=d.get("lightRadius", 0.5),
            light_intensity=d.get("lightIntensity", 1.0),
            color_scaling=d.get("colorScaling", 1.0),
            num_bounces=d.get("numBounces", 2))
        pj = j.get("phase", {})
        sel_phase = d.get("selectedPhaseFunction", "")
        if sel_phase == "Rayleigh":
            phase = PhaseFunctionRayleigh.make()
        else:
            phase = PhaseFunctionHenyeyGreenstein.make(
                g=pj.get("Henyey-Greenstein", {}).get("g", 0.0))

    simple = j.get("ImageEvaluator", {}).get("Simple", {})
    sel_cam = simple.get("selectedCamera", "Sphere")
    sel_ray = simple.get("selectedRayEvaluator", "DVR")
    sel_vol = simple.get("selectedVolume", "")
    sel_tf = rj.get(sel_ray, {}).get("selectedTF", "")

    camera = cameras.get(sel_cam) or next(iter(cameras.values()), None)
    volume = volume_override or volumes.get(sel_vol) \
        or next(iter(volumes.values()), None)
    tf = tfs.get(sel_tf) or next(iter(tfs.values()), None)
    ray_config = ray_evaluators.get(sel_ray) \
        or next(iter(ray_evaluators.values()), None)
    ray_mode = "iso" if sel_ray == "Iso" else "dvr"
    samples = 2 ** simple.get("samplesPerIterationLog2", 0) \
        if simple.get("samplesPerIterationLog2", 0) > 0 else 1

    evaluator = ImageEvaluatorSimple(
        camera=camera, volume=volume, tf=tf, ray_config=ray_config,
        brdf=brdf if (brdf.enable_phong
                      or brdf.enable_magnitude_scaling) else None,
        samples=1, ray_mode=ray_mode)
    return SceneConfig(
        evaluator=evaluator, cameras=cameras, volumes=volumes, tfs=tfs,
        ray_evaluators=ray_evaluators, brdf=brdf, phase=phase,
        mc_config=mc_config, raw=j,
        selected={"camera": sel_cam, "volume": sel_vol, "tf": sel_tf,
                  "ray": sel_ray, "samples": samples})
