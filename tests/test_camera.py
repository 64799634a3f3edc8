"""Camera tests: golden values against the reference formulas
(reference: renderer/camera.cpp:553-582, renderer_camera.cuh:31-53)."""
import numpy as np
import jax.numpy as jnp

from fvsrn_tpu.camera import (
    CameraOnASphere, camera_matrix, euler_to_cartesian, generate_rays,
    fibonacci_sphere_cameras,
)


def test_euler_to_cartesian_ym_identity():
    # pitch=0, yaw=0, distance=1, Ym: pos=(cos0 cos0, 0, 0) permuted by
    # (-1,-2,-3) -> (-1, 0, 0)
    p = euler_to_cartesian(jnp.float32(0), jnp.float32(0), jnp.float32(1),
                           "Ym")
    np.testing.assert_allclose(np.asarray(p), [-1, 0, 0], atol=1e-6)


def test_euler_to_cartesian_pitch():
    # pitch=pi/2 -> pos=(0, -1, 0) before perm (pitch inverted), Ym perm
    # (-1,-2,-3) -> (0, 1, 0)
    p = euler_to_cartesian(jnp.float32(np.pi / 2), jnp.float32(0),
                           jnp.float32(1), "Ym")
    np.testing.assert_allclose(np.asarray(p), [0, 1, 0], atol=1e-6)


def test_camera_matrix_orthonormal():
    cam = CameraOnASphere.make(pitch=0.3, yaw=1.1, distance=2.0,
                               center=(0.1, -0.2, 0.3))
    m = np.asarray(camera_matrix(cam))[0]
    origin, right, up = m
    front = np.asarray(cam.get_front())[0]
    # right/up/front orthonormal
    np.testing.assert_allclose(np.linalg.norm(right), 1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(up), 1, atol=1e-5)
    assert abs(np.dot(right, up)) < 1e-5
    assert abs(np.dot(right, front)) < 1e-5
    assert abs(np.dot(up, front)) < 1e-5
    # camera looks at the center
    to_center = np.asarray(cam.center) - origin
    to_center /= np.linalg.norm(to_center)
    np.testing.assert_allclose(front, to_center, atol=1e-5)


def test_generate_rays_center_pixel():
    cam = CameraOnASphere.make(pitch=0.0, yaw=0.0, distance=1.5)
    start, direction = generate_rays(cam, 64, 64)
    assert start.shape == (1, 64, 64, 3)
    assert direction.shape == (1, 64, 64, 3)
    # all rays unit length
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(direction), axis=-1), 1.0, atol=1e-5)
    # central rays point roughly at the center
    front = np.asarray(cam.get_front())[0]
    center_dir = np.asarray(direction)[0, 31:33, 31:33].mean(axis=(0, 1))
    center_dir /= np.linalg.norm(center_dir)
    np.testing.assert_allclose(center_dir, front, atol=1e-2)


def test_generate_rays_ndc_convention():
    """ndc = 2*(x+0.5)/W - 1 (reference: renderer_camera_kernels.cuh:26-28):
    for W=2 pixels ndc_x = -0.5, +0.5."""
    cam = CameraOnASphere.make(distance=1.0)
    m = camera_matrix(cam)
    _, d = generate_rays(m, 2, 2, cam.fov_y_radians)
    m = np.asarray(m)[0]
    right, up = m[1], m[2]
    front = np.cross(up, right)
    tan = np.tan(cam.fov_y_radians / 2)
    expect = front + (-0.5) * tan * right + (-0.5) * tan * up
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(d)[0, 0, 0], expect, atol=1e-5)


def test_batched_cameras():
    cams = fibonacci_sphere_cameras(5, distance=2.0)
    assert cams.batch == 5
    m = camera_matrix(cams)
    assert m.shape == (5, 3, 3)
    start, direction = generate_rays(cams, 8, 8)
    assert start.shape == (5, 8, 8, 3)
    # distances from center are all 2
    d = np.linalg.norm(np.asarray(m)[:, 0, :], axis=-1)
    np.testing.assert_allclose(d, 2.0, atol=1e-5)
