"""fvsrn_tpu: a TPU-native differentiable direct-volume renderer + scene
representation network (SRN) compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of fV-SRN
("Fast Neural Representations for Direct Volume Rendering", reference at
/root/reference, arXiv:2112.01579): differentiable DVR/iso/Monte-Carlo ray
marching, transfer functions, grid & network volume interpolation with
latent-grid encodings, fused MXU-resident SRN evaluation inside the ray
march, world- and screen-space training with importance sampling, and
multi-chip scaling over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from . import blending, brdf, camera, transfer
from .brdf import BRDFLambert
from .camera import CameraOnASphere, generate_rays
from .raytracer.dvr import RayEvaluationSteppingDvr, trace_dvr
from .raytracer.evaluator import ImageEvaluatorSimple, render_image
from .raytracer.iso import RayEvaluationSteppingIso, trace_iso
from .transfer import (
    TransferFunctionGaussian,
    TransferFunctionIdentity,
    TransferFunctionPiecewiseLinear,
    TransferFunctionTexture,
)
from .inference import LoadedModel
from .models.latent import LatentSpace
from .models.network_volume import VolumeInterpolationNetwork
from .models.srn import SceneRepresentationNetwork
from .modules.registry import load_from_json
from .phase import PhaseFunctionHenyeyGreenstein, PhaseFunctionRayleigh
from .raytracer.montecarlo import RayEvaluationMonteCarlo, trace_mc
from .volume.ensemble import VolumeEnsembleFactory
from .volume.grid import VolumeInterpolationGrid
from .volume.implicit import VolumeInterpolationImplicit, create_implicit_grid
from .volume.volume import Volume
