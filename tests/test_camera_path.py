"""Camera-path interpolation tests: quaternion roundtrip, slerp geodesics,
spline endpoint interpolation, rotation validity along the path."""

import numpy as np
import pytest

from nerf_kinematics_tpu.poses.camera_path import (
    interpolate_path,
    quat_to_rotmat,
    rotmat_to_quat,
    slerp,
)
from nerf_kinematics_tpu.poses.orbit import generate_orbit_poses


def test_quat_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        # Random rotation via QR.
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        back = quat_to_rotmat(rotmat_to_quat(q))
        np.testing.assert_allclose(back, q, atol=1e-10)


def test_slerp_half_angle():
    q0 = rotmat_to_quat(np.eye(3))
    Rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    q1 = rotmat_to_quat(Rz90)
    qm = slerp(q0, q1, 0.5)
    Rm = quat_to_rotmat(qm)
    # Halfway = 45° about z.
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    np.testing.assert_allclose(Rm, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-10)


def test_path_hits_keyframes():
    kf = generate_orbit_poses(np.zeros(3), 2.0, 4)
    path = interpolate_path(kf, 7, loop=False)  # 2 frames per segment + end
    np.testing.assert_allclose(path[0], kf[0], atol=1e-9)
    np.testing.assert_allclose(path[-1], kf[-1], atol=1e-9)


def test_path_rotations_valid_and_smooth():
    kf = generate_orbit_poses(np.zeros(3), 2.0, 6)
    path = interpolate_path(kf, 60, loop=True)
    rots = path[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", rots, rots)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (60, 1, 1)), atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(rots), 1.0, atol=1e-8)
    # Positions stay near the orbit radius and steps are smooth.
    r = np.linalg.norm(path[:, :3, 3], axis=1)
    assert (np.abs(r - 2.0) < 0.2).all()
    steps = np.linalg.norm(np.diff(path[:, :3, 3], axis=0), axis=1)
    assert steps.max() < 3 * steps.mean()


def test_single_keyframe_repeats():
    kf = generate_orbit_poses(np.zeros(3), 1.0, 1)
    path = interpolate_path(kf[:1], 5)
    assert path.shape == (5, 4, 4)
    for p in path:
        np.testing.assert_allclose(p, kf[0])
