"""Cameras and ray generation.

TPU-native rebuild of the reference camera stack:
- ``CameraOnASphere`` host module (reference: renderer/camera.h:118-225,
  renderer/camera.cpp:553-582 ``eulerToCartesian``/``computeParameters``).
- Reference-frame ray evaluation (reference: renderer/renderer_camera.cuh:31-53
  ``CameraReferenceFrame::eval``).
- Batched ray generation returning (B, H, W, 3) tensors with the channel last
  (reference: renderer/renderer_camera_kernels.cuh:12-40
  ``CameraGenerateRayKernel``).

Instead of an NVRTC-compiled kernel, rays are produced by a pure, jittable,
differentiable function; XLA fuses it into whatever consumes the rays, so ray
generation never touches HBM when fused into the renderer.
"""
from __future__ import annotations

import math
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .utils.pytree import static_field, struct
from .utils.vecmath import cross, normalize

# Orientation tables (reference: renderer/camera.cpp:17-35).
ORIENTATIONS = ("Xp", "Xm", "Yp", "Ym", "Zp", "Zm")
_ORIENTATION_UP = {
    "Xp": (1, 0, 0), "Xm": (-1, 0, 0),
    "Yp": (0, 1, 0), "Ym": (0, -1, 0),
    "Zp": (0, 0, 1), "Zm": (0, 0, -1),
}
_ORIENTATION_PERMUTATION = {
    "Xp": (2, -1, -3), "Xm": (-2, 1, 3),
    "Yp": (1, 2, 3), "Ym": (-1, -2, -3),
    "Zp": (-3, -1, 2), "Zm": (3, 1, -2),
}
_ORIENTATION_INVERT_YAW = {
    "Xp": False, "Xm": True, "Yp": True, "Ym": False, "Zp": True, "Zm": False,
}


def euler_to_cartesian(pitch: Array, yaw: Array, distance: Array,
                       orientation: str = "Ym") -> Array:
    """Spherical coordinates -> offset from the look-at center.

    Differentiable port of ``CameraOnASphere::eulerToCartesian``
    (reference: renderer/camera.cpp:553-570). pitch/yaw in radians;
    broadcasting over leading axes; returns (..., 3).
    """
    yaw = yaw if _ORIENTATION_INVERT_YAW[orientation] else -yaw
    pitch = -pitch  # OrientationInvertPitch is false for all orientations
    pos = jnp.stack([
        jnp.cos(pitch) * jnp.cos(yaw) * distance,
        jnp.sin(pitch) * distance,
        jnp.cos(pitch) * jnp.sin(yaw) * distance,
    ], axis=-1)
    perm = _ORIENTATION_PERMUTATION[orientation]
    idx = [abs(p) - 1 for p in perm]
    sign = jnp.asarray([1.0 if p > 0 else -1.0 for p in perm], dtype=pos.dtype)
    return pos[..., idx] * sign


@struct
class CameraOnASphere:
    """Orbit camera: pitch/yaw/distance around a center, facing inward.

    The differentiable parameters mirror the reference's ``Parameter<double3>``
    pair (center, pitchYawDistance) and can be batched with a leading axis.
    ``fov_y_radians`` and ``orientation`` are static configuration.
    """
    center: Array  # (3,) or (B, 3)
    pitch_yaw_distance: Array  # (3,) or (B, 3)
    orientation: str = static_field(default="Ym")
    fov_y_radians: float = static_field(default=math.radians(45.0))

    @classmethod
    def make(cls, center=(0.0, 0.0, 0.0), pitch=0.0, yaw=0.0, distance=1.0,
             orientation: str = "Ym", fov_y_radians: float = math.radians(45.0)):
        return cls(
            center=np.asarray(center, dtype=np.float32),
            pitch_yaw_distance=np.asarray([pitch, yaw, distance],
                                          dtype=np.float32),
            orientation=orientation,
            fov_y_radians=fov_y_radians,
        )

    @property
    def batch(self) -> int:
        b = 1
        if self.center.ndim == 2:
            b = max(b, self.center.shape[0])
        if self.pitch_yaw_distance.ndim == 2:
            b = max(b, self.pitch_yaw_distance.shape[0])
        return b

    def get_parameters(self) -> Array:
        """(B, 3, 3) reference-frame matrix: rows = eye, right, up
        (reference: renderer/camera.cpp:458-516 ``updateCameraMatrix``)."""
        return camera_matrix(self)

    def get_origin(self) -> Array:
        pyd = jnp.atleast_2d(self.pitch_yaw_distance)
        center = jnp.atleast_2d(self.center)
        return euler_to_cartesian(
            pyd[..., 0], pyd[..., 1], pyd[..., 2], self.orientation) + center

    def get_front(self) -> Array:
        center = jnp.atleast_2d(self.center)
        return normalize(center - self.get_origin())


def camera_matrix(cam: CameraOnASphere) -> Array:
    """Compute the (B, 3, 3) reference frame [origin; right; up].

    Differentiable equivalent of ``CameraOnASphere::updateCameraMatrix``
    (reference: renderer/camera.cpp:486-516): front = normalize(lookAt-origin),
    right = normalize(front x up), up2 = normalize(right x front).
    """
    center = jnp.atleast_2d(cam.center)
    pyd = jnp.atleast_2d(cam.pitch_yaw_distance)
    up = jnp.asarray(_ORIENTATION_UP[cam.orientation], dtype=center.dtype)
    origin = euler_to_cartesian(pyd[..., 0], pyd[..., 1], pyd[..., 2],
                                cam.orientation) + center
    front = normalize(center - origin)
    right = normalize(cross(front, jnp.broadcast_to(up, front.shape)))
    up2 = normalize(cross(right, front))
    return jnp.stack([origin, right, up2], axis=-2)


def generate_rays(matrix_or_camera: Union[Array, CameraOnASphere],
                  width: int, height: int,
                  fov_y_radians: float | None = None,
                  *,
                  jitter: Array | None = None,
                  dtype=jnp.float32) -> tuple[Array, Array]:
    """Generate camera rays for every pixel.

    Mirrors ``ICamera::generateRays`` + ``CameraGenerateRayKernel``
    (reference: renderer/camera.cpp:37-99,
    renderer/renderer_camera_kernels.cuh:12-40):
    ndc = 2*(pix+0.5)/size - 1 in [-1, 1]^2,
    dir = normalize(front + ndc.x*tan(fovX/2)*right + ndc.y*tan(fovY/2)*up)
    with front = up x right, tan(fovX/2) = tan(fovY/2) * aspect.

    Args:
      matrix_or_camera: (B, 3, 3) reference-frame matrix or a camera module.
      jitter: optional (S, H, W, 2) in [0,1) for multisampling (the reference's
        ``CameraGenerateRayMultisamplingKernel`` puts samples in the batch
        axis); ``None`` samples pixel centers.

    Returns:
      (ray_start, ray_dir), each (B, H, W, 3), channels last like the
      reference so a reshape to (B*H*W, 3) feeds SRN training directly.
    """
    if isinstance(matrix_or_camera, CameraOnASphere):
        if fov_y_radians is None:
            fov_y_radians = matrix_or_camera.fov_y_radians
        matrix = camera_matrix(matrix_or_camera)
    else:
        matrix = matrix_or_camera
        if fov_y_radians is None:
            raise ValueError("fov_y_radians required with an explicit matrix")
    matrix = matrix.astype(dtype)
    if matrix.ndim == 2:
        matrix = matrix[None]

    aspect = width / height
    tan_fov_y = math.tan(fov_y_radians / 2)
    tan_fov_x = tan_fov_y * aspect

    eye = matrix[:, None, None, 0, :]    # (B,1,1,3)
    right = matrix[:, None, None, 1, :]
    up = matrix[:, None, None, 2, :]
    front = cross(up, right)

    x = jnp.arange(width, dtype=dtype)
    y = jnp.arange(height, dtype=dtype)
    if jitter is None:
        ndc_x = 2 * (x + 0.5) / width - 1    # (W,)
        ndc_y = 2 * (y + 0.5) / height - 1   # (H,)
        ndc_x = jnp.broadcast_to(ndc_x[None, None, :], (1, height, width))
        ndc_y = jnp.broadcast_to(ndc_y[None, :, None], (1, height, width))
    else:
        # multisampling: samples live in the leading (batch) axis
        ndc_x = 2 * (x[None, None, :] + jitter[..., 0]) / width - 1
        ndc_y = 2 * (y[None, :, None] + jitter[..., 1]) / height - 1
        if matrix.shape[0] != 1:
            raise ValueError(
                "multisampling requires an unbatched camera (samples occupy "
                "the batch axis, matching the reference)")

    direction = (front
                 + ndc_x[..., None] * (tan_fov_x * right)
                 + ndc_y[..., None] * (tan_fov_y * up))
    direction = normalize(direction)
    batch = max(matrix.shape[0], ndc_x.shape[0])
    ray_start = jnp.broadcast_to(eye, (batch, height, width, 3))
    ray_dir = jnp.broadcast_to(direction, (batch, height, width, 3))
    return ray_start, ray_dir


def fibonacci_sphere_cameras(n: int, center=(0.0, 0.0, 0.0), distance=1.0,
                             orientation="Ym",
                             fov_y_radians=math.radians(45.0),
                             pitch_range=(-80.0, 80.0)) -> CameraOnASphere:
    """Batched cameras on a fibonacci spiral around the object, the screen-space
    training camera distribution (reference: applications/volnet/
    training_data.py:408-452, common/utils.py fibonacci_sphere)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)          # polar angle in [0, pi]
    golden = np.pi * (1 + 5 ** 0.5)
    theta = np.mod(golden * i, 2 * np.pi)   # azimuth
    pitch = np.clip(np.pi / 2 - phi,
                    math.radians(pitch_range[0]), math.radians(pitch_range[1]))
    pyd = np.stack([pitch, theta, np.full(n, distance)], axis=-1)
    return CameraOnASphere(
        center=np.broadcast_to(np.asarray(center, np.float32), (n, 3)),
        pitch_yaw_distance=np.asarray(pyd, np.float32),
        orientation=orientation,
        fov_y_radians=fov_y_radians,
    )
