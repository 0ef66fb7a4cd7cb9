"""COLMAP import tests on a synthetic text model with known geometry."""

import json
import os

import numpy as np
import pytest

from nerf_kinematics_tpu.poses.colmap import (
    colmap_pose_to_c2w,
    colmap_to_transforms,
    parse_cameras_txt,
    parse_images_txt,
    qvec_to_rotmat,
)


def _rotmat_to_quat(R):
    """Robust rotation-matrix → (w, x, y, z) quaternion (Shepperd's method)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return (0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                (R[1, 0] - R[0, 1]) / s)
    i = int(np.argmax(np.diag(R)))
    if i == 0:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        return ((R[2, 1] - R[1, 2]) / s, 0.25 * s,
                (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s)
    if i == 1:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        return ((R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                0.25 * s, (R[1, 2] + R[2, 1]) / s)
    s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
    return ((R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
            (R[1, 2] + R[2, 1]) / s, 0.25 * s)


def _write_model(tmp_path, poses_c2w, w=64, h=48, f=40.0):
    """Write cameras.txt/images.txt for given NeRF-convention c2w poses."""
    (tmp_path / "cameras.txt").write_text(
        "# cameras\n1 PINHOLE {} {} {} {} {} {}\n".format(w, h, f, f, w / 2, h / 2)
    )
    lines = ["# images"]
    for i, c2w in enumerate(poses_c2w):
        # Invert our conversion: c2w (OpenGL) → COLMAP w2c quaternion.
        m = c2w.copy()
        m[:3, 1:3] *= -1.0
        R = m[:3, :3].T
        t = -R @ m[:3, 3]
        qw, qx, qy, qz = _rotmat_to_quat(R)
        lines.append(
            f"{i+1} {qw} {qx} {qy} {qz} {t[0]} {t[1]} {t[2]} 1 im_{i}.png"
        )
        lines.append("")  # empty POINTS2D line
    (tmp_path / "images.txt").write_text("\n".join(lines) + "\n")


def test_qvec_identity():
    np.testing.assert_allclose(qvec_to_rotmat([1, 0, 0, 0]), np.eye(3))
    # 90° about z.
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = qvec_to_rotmat(q)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_roundtrip_poses(tmp_path):
    from nerf_kinematics_tpu.poses.orbit import generate_orbit_poses

    poses = generate_orbit_poses(np.zeros(3), radius=3.0, n_poses=6)
    _write_model(tmp_path, poses)
    cams = parse_cameras_txt(str(tmp_path / "cameras.txt"))
    assert cams[1].model == "PINHOLE"
    images = parse_images_txt(str(tmp_path / "images.txt"))
    assert len(images) == 6
    rec = np.stack([colmap_pose_to_c2w(im["qvec"], im["tvec"]) for im in images])
    np.testing.assert_allclose(rec, poses, atol=1e-8)


def test_full_conversion_reorients_and_scales(tmp_path, capsys):
    from nerf_kinematics_tpu.poses.orbit import generate_orbit_poses

    # Orbit in XY plane looking at origin: up is already +z, avg dist 3.
    poses = generate_orbit_poses(np.zeros(3), radius=3.0, n_poses=8)
    _write_model(tmp_path, poses)
    out = colmap_to_transforms(str(tmp_path), images_dir=None, out_path=str(tmp_path / "t.json"))
    printed = capsys.readouterr().out
    assert "up vector" in printed and "center of attention" in printed
    assert "avg camera distance" in printed

    data = json.loads((tmp_path / "t.json").read_text())
    assert len(data["frames"]) == 8
    mats = np.asarray([f["transform_matrix"] for f in data["frames"]])
    # After normalization: centered at origin, avg distance 4.0.
    d = np.linalg.norm(mats[:, :3, 3], axis=1)
    np.testing.assert_allclose(d.mean(), 4.0, rtol=1e-5)
    # Cameras still look at the center (orbit geometry preserved).
    back = mats[:, :3, 2]
    to_cam = mats[:, :3, 3] / d[:, None]
    np.testing.assert_allclose(back, to_cam, atol=1e-5)
    # Intrinsics preserved.
    assert data["w"] == 64 and data["fl_x"] == pytest.approx(40.0)


def test_keep_colmap_coords(tmp_path):
    from nerf_kinematics_tpu.poses.orbit import generate_orbit_poses

    poses = generate_orbit_poses(np.ones(3) * 5, radius=2.0, n_poses=4)
    _write_model(tmp_path, poses)
    out = colmap_to_transforms(str(tmp_path), keep_colmap_coords=True, verbose=False)
    mats = np.asarray([f["transform_matrix"] for f in out["frames"]])
    np.testing.assert_allclose(mats, poses, atol=1e-8)
