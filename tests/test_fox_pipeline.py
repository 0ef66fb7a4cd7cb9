"""Fox-capture import path (VERDICT round-1 item 9).

The reference ships 49 real fox images
(datasets/instant-ngp-preprocessed/fox49/images) but NO poses, and this
environment has no COLMAP binary — so real-fox quality numbers are blocked
on exactly one thing: running COLMAP. These tests prove everything on OUR
side of that line: a synthetic COLMAP TXT model at fox-like intrinsics
(OPENCV model, 1080x1920 portrait, nonzero k1/k2) flows through
colmap_to_transforms → transforms.json → the NGP loader with distortion
intact, and the CLI detects COLMAP's absence with an actionable error.

Reference: instant_ngp_collab_cloud.ipynb cells 33-37 (colmap2nerf flow).
"""

import json
import os

import numpy as np
import pytest

from nerf_kinematics_tpu.poses.colmap import (
    colmap_pose_to_c2w, colmap_to_transforms, qvec_to_rotmat,
)

FOX_IMAGES = "/root/reference/datasets/instant-ngp-preprocessed/fox49/images"

# Fox-like OPENCV intrinsics: 1080x1920 portrait (the real capture's size),
# phone-camera focal, mild radial distortion.
FOX_CAM = dict(fl=1160.0, cx=540.0, cy=960.0, w=1080, h=1920,
               k1=0.05, k2=-0.08, p1=0.0005, p2=-0.0004)


def _rotmat_to_qvec(R):
    """Rotation matrix → COLMAP (w, x, y, z) quaternion."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w < 1e-8:  # not hit by these fixtures (all rotations are mild)
        raise ValueError("degenerate quaternion")
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def _c2w_to_colmap(c2w):
    """Invert colmap_pose_to_c2w: NeRF c2w → COLMAP (qvec, tvec)."""
    m = c2w.copy()
    m[:3, 1:3] *= -1.0  # back to COLMAP's y-down/z-forward camera axes
    R = m[:3, :3].T
    t = -R @ m[:3, 3]
    return _rotmat_to_qvec(R), t


def _arc_pose(theta, radius=3.0, height=1.2):
    """Camera on a horizontal arc, looking at the origin (fox-style orbit)."""
    pos = np.array([radius * np.cos(theta), radius * np.sin(theta), height])
    fwd = -pos / np.linalg.norm(pos)  # camera -z (look at origin)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, true_up, -fwd
    c2w[:3, 3] = pos
    return c2w


def _write_colmap_model(dirpath, n_frames, image_names):
    cam = FOX_CAM
    with open(os.path.join(dirpath, "cameras.txt"), "w") as f:
        f.write("# Camera list\n")
        f.write(
            f"1 OPENCV {cam['w']} {cam['h']} {cam['fl']} {cam['fl']} "
            f"{cam['cx']} {cam['cy']} {cam['k1']} {cam['k2']} "
            f"{cam['p1']} {cam['p2']}\n"
        )
    lines = ["# Image list: every other line is POINTS2D"]
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        q, t = _c2w_to_colmap(_arc_pose(theta))
        lines.append(
            f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} "
            f"1 {image_names[i]}"
        )
        lines.append("")  # empty POINTS2D row
    with open(os.path.join(dirpath, "images.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_colmap_pose_roundtrip():
    c2w = _arc_pose(0.7)
    q, t = _c2w_to_colmap(c2w)
    assert abs(np.linalg.norm(q) - 1.0) < 1e-9
    rec = colmap_pose_to_c2w(q, t)
    np.testing.assert_allclose(rec, c2w, atol=1e-9)
    # Quaternion encode/decode agree.
    m = c2w.copy()
    m[:3, 1:3] *= -1.0
    np.testing.assert_allclose(qvec_to_rotmat(q), m[:3, :3].T, atol=1e-9)


def test_fox_colmap_import_end_to_end(tmp_path):
    """Synthetic COLMAP model at fox intrinsics → transforms.json → NGP
    loader, distortion coefficients intact."""
    from nerf_kinematics_tpu.data.ngp_transforms import load_transforms_json

    has_fox = os.path.isdir(FOX_IMAGES)
    names = (
        sorted(os.listdir(FOX_IMAGES)) if has_fox
        else [f"{i:04d}.jpg" for i in range(2, 51)]
    )
    n = min(len(names), 49)
    text = tmp_path / "colmap_text"
    text.mkdir()
    _write_colmap_model(str(text), n, names)

    out_json = tmp_path / "transforms.json"
    result = colmap_to_transforms(
        str(text),
        images_dir=FOX_IMAGES if has_fox else None,
        aabb_scale=16.0,
        out_path=str(out_json),
        with_sharpness=False,
        verbose=False,
    )
    assert len(result["frames"]) == n
    assert result["k1"] == FOX_CAM["k1"] and result["k2"] == FOX_CAM["k2"]
    assert result["w"] == 1080 and result["h"] == 1920

    # Normalization invariants (the cell-37 outputs): avg camera distance
    # rescaled to 4.0, cameras looking inward.
    poses = np.array([fr["transform_matrix"] for fr in result["frames"]])
    d = np.linalg.norm(poses[:, :3, 3], axis=1)
    np.testing.assert_allclose(d.mean(), 4.0, rtol=1e-5)

    # The loader parses it and carries distortion into Intrinsics.
    _, loaded_poses, intr, aabb = load_transforms_json(
        str(out_json), require_images=False
    )
    assert loaded_poses.shape == (n, 4, 4)
    assert aabb == 16.0
    assert intr.distortion == (FOX_CAM["k1"], FOX_CAM["k2"],
                               FOX_CAM["p1"], FOX_CAM["p2"])
    assert intr.width == 1080 and intr.height == 1920


@pytest.mark.skipif(not os.path.isdir(FOX_IMAGES),
                    reason="fox images not in environment")
def test_fox_real_image_sharpness():
    from nerf_kinematics_tpu.poses.sharpness import compute_sharpness

    name = sorted(os.listdir(FOX_IMAGES))[0]
    s = compute_sharpness(os.path.join(FOX_IMAGES, name))
    assert np.isfinite(s) and s > 0


def test_colmap_cli_reports_missing_binary(tmp_path, monkeypatch):
    """--run_colmap without the binary exits with the actionable message."""
    from nerf_kinematics_tpu.cli import colmap2nerf as cli

    monkeypatch.setattr("shutil.which", lambda name: None)
    with pytest.raises(SystemExit) as e:
        cli.main(["--run_colmap", "--images", str(tmp_path),
                  "--text", str(tmp_path / "t"), "--out",
                  str(tmp_path / "o.json")])
    assert "colmap" in str(e.value).lower()
    assert "install" in str(e.value).lower()
