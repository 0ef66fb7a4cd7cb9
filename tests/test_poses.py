"""Pose layer tests: parser, normalization, orbits, aabb, conversion pipeline.

Golden values are taken from the reference dataset
datasets/nerf-raw/wheel_real_robot/poses.txt (row values cited inline) and from
the documented reference semantics (parser_instant_ngp.py)."""

import json
import math

import numpy as np
import pytest

from nerf_kinematics_tpu.poses import (
    aabb_scale_for,
    camera_centers,
    generate_test_poses,
    generate_video_poses,
    normalize_poses,
    parse_poses_text,
)
from nerf_kinematics_tpu.poses.pipeline import convert_poses, intrinsics_from_fov

SAMPLE = """
[     0.730263,    -0.682985,    -0.015725,  1072.532608 ;
     -0.683050,    -0.729519,    -0.035290,   132.989927 ;
      0.012630,     0.036512,    -0.999253,   -53.612386 ;
      0.000000,     0.000000,     0.000000,     1.000000 ];


[     0.730277,    -0.682968,    -0.015808,  1072.524301 ;
     -0.683036,    -0.729532,    -0.035287,   205.916738 ;
      0.012568,     0.036567,    -0.999252,   -53.688525 ;
      0.000000,     0.000000,     0.000000,     1.000000 ];
"""


def test_parse_sample_text():
    mats = parse_poses_text(SAMPLE)
    assert mats.shape == (2, 4, 4)
    # Golden values: first matrix of wheel_real_robot/poses.txt.
    assert mats[0, 0, 0] == pytest.approx(0.730263)
    assert mats[0, 0, 3] == pytest.approx(1072.532608)
    assert mats[1, 1, 3] == pytest.approx(205.916738)
    assert np.allclose(mats[:, 3], [0, 0, 0, 1])


def test_parse_scientific_notation_and_garbage_rows():
    text = "[1e0, 2.5e-1, 0, 3 ; 0, 1, 0, -4E+1 ; 0, 0, 1, 0 ; 0,0,0,1]"
    mats = parse_poses_text(text)
    assert mats[0, 0, 1] == pytest.approx(0.25)
    assert mats[0, 1, 3] == pytest.approx(-40.0)


def test_parse_rejects_empty():
    with pytest.raises(ValueError):
        parse_poses_text("no matrices here")


def test_parse_real_poses_file(wheel_dataset):
    from nerf_kinematics_tpu.poses import parse_poses_file

    mats = parse_poses_file(wheel_dataset / "poses.txt")
    assert mats.shape == (12, 4, 4)
    # Rotations should be orthonormal to a few decimals (robot FK output).
    rots = mats[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", rots, rots)
    assert np.allclose(eye, np.eye(3), atol=1e-3)


def test_normalize_recenter_scale_and_zflip():
    mats = parse_poses_text(SAMPLE)
    # Duplicate so there are 3 poses: 1 val + 2 train.
    mats = np.concatenate([mats, mats[:1]], axis=0)
    norm = normalize_poses(mats, recenter=True, scale_trans=2.0)
    centers = camera_centers(norm.train)
    # Max train radius equals scale_trans after normalization.
    assert np.linalg.norm(centers, axis=1).max() == pytest.approx(2.0)
    # Centroid at origin.
    assert np.allclose(centers.mean(axis=0), 0.0, atol=1e-12)
    # Z column flipped relative to input rotation.
    assert norm.train[0, 0, 2] == pytest.approx(+0.015808)
    assert norm.train[0, 2, 2] == pytest.approx(+0.999252)
    # Val transformed with the same affine map.
    expected_val_xyz = (mats[0, :3, 3] - norm.center) * norm.scale_factor
    expected_val_xyz[2] *= -1  # z-flip applies to translation z too
    assert np.allclose(norm.val[:3, 3], expected_val_xyz)


def test_normalize_without_recenter_is_identity():
    """The reference's no-recenter branch logs a Z-flip but applies nothing
    (parser_instant_ngp.py:242-244); we match that behavior."""
    mats = parse_poses_text(SAMPLE)
    norm = normalize_poses(mats, recenter=False)
    assert np.allclose(norm.train, mats[1:])
    assert np.allclose(norm.val, mats[0])


def test_aabb_power_of_two_bounds():
    # Two cameras 10 apart: max dist from centroid 5, target 2*5=10 → 16.
    m = np.tile(np.eye(4), (2, 1, 1))
    m[0, :3, 3] = [0, 0, 0]
    m[1, :3, 3] = [10, 0, 0]
    assert aabb_scale_for(m) == 16.0
    # Degenerate cluster → minimum 1.
    m[1, :3, 3] = [0, 0, 0]
    assert aabb_scale_for(m) == 1.0
    # Enormous scene clamps at 128.
    m[1, :3, 3] = [1e6, 0, 0]
    assert aabb_scale_for(m) == 128.0


def test_orbit_poses_look_at_center():
    center = np.array([1.0, 2.0, 3.0])
    poses = generate_test_poses(center, radius=50, n_poses=8)
    assert poses.shape == (8, 4, 4)
    positions = poses[:, :3, 3]
    # All positions on the circle.
    assert np.allclose(np.linalg.norm(positions[:, :2] - center[:2], axis=1), 50.0)
    assert np.allclose(positions[:, 2], center[2])
    # -Z camera axis (third column) points from center to camera ⇒ camera looks at center.
    back = poses[:, :3, 2]
    to_cam = positions - center
    to_cam /= np.linalg.norm(to_cam, axis=1, keepdims=True)
    assert np.allclose(back, to_cam, atol=1e-12)
    # Rotation orthonormal, right-handed.
    rots = poses[:, :3, :3]
    assert np.allclose(np.einsum("nij,nkj->nik", rots, rots), np.eye(3), atol=1e-12)
    assert np.allclose(np.linalg.det(rots), 1.0)


def test_video_poses_height_wobble():
    center = np.zeros(3)
    poses = generate_video_poses(center)
    assert poses.shape == (60, 4, 4)
    z = poses[:, 2, 3]
    # 5*sin(4θ) wobble: near-amplitude-5 extremes (grid never lands exactly on
    # the peak with 60 samples and frequency 4), mean ~0.
    assert 4.7 < z.max() <= 5.0
    assert -5.0 <= z.min() < -4.7
    assert abs(z.mean()) < 1e-9


def test_intrinsics_realsense_defaults():
    intr = intrinsics_from_fov(1280, 720, 87.0, 58.0)
    assert intr["fl_x"] == pytest.approx(0.5 * 1280 / math.tan(math.radians(87.0) / 2))
    assert intr["fl_y"] == pytest.approx(0.5 * 720 / math.tan(math.radians(58.0) / 2))
    assert intr["cx"] == 640.0 and intr["cy"] == 360.0


def test_full_conversion_pipeline(wheel_dataset, tmp_path):
    out = tmp_path / "transforms.json"
    result = convert_poses(
        poses_path=str(wheel_dataset / "poses.txt"),
        image_folder=str(wheel_dataset / "images_robot"),
        recenter=True,
        scale_trans=1.0,
        output=str(out),
    )
    # 12 poses → 1 val + 11 train (matches paralaje.ipynb: wheel has 11 frames).
    assert len(result.train["frames"]) == 11
    assert len(result.val["frames"]) == 1
    assert len(result.test["frames"]) == 8
    assert len(result.video["frames"]) == 60

    data = json.loads(out.read_text())
    assert data["w"] == 1280 and data["h"] == 720
    assert set(data) >= {
        "camera_angle_x", "camera_angle_y", "fl_x", "fl_y",
        "k1", "k2", "p1", "p2", "cx", "cy", "w", "h", "aabb_scale", "frames",
    }
    f0 = data["frames"][0]
    assert "sharpness" in f0 and f0["sharpness"] > 0
    assert "TestNERF 1.jpg" in f0["file_path"]  # train starts at image index 1
    # aabb_scale: max radius normalized to 1.0 → target 2.0 → power-of-2 = 2.0.
    assert data["aabb_scale"] == 2.0
    # Test frames use transform_matrix_start (reference schema).
    test = json.loads((tmp_path / "transforms_test.json").read_text())
    assert "transform_matrix_start" in test["frames"][0]
    video = json.loads((tmp_path / "transforms_test_video.json").read_text())
    assert "transform_matrix" in video["frames"][0]


def test_sharpness_matches_pil_reference(wheel_dataset):
    """compute_sharpness_array must match PIL's filter on a real image."""
    from PIL import Image

    from nerf_kinematics_tpu.poses.sharpness import (
        compute_sharpness,
        compute_sharpness_array,
    )

    path = wheel_dataset / "images_robot" / "TestNERF 0.jpg"
    via_pil = compute_sharpness(path)
    with Image.open(path) as im:
        gray = np.asarray(im.convert("L"))
    via_np = compute_sharpness_array(gray)
    assert via_pil > 0
    # PIL rounds/clamps identically on interior; borders are edge-replicated in
    # PIL vs passthrough here — allow a small relative tolerance.
    assert via_np == pytest.approx(via_pil, rel=0.05)


def test_conversion_skips_missing_images(wheel_dataset, tmp_path):
    """The frame-image matcher must skip missing indices and use each image
    once (parser_instant_ngp.py:277-295 semantics): thin out a copy of the
    capture and convert."""
    import shutil

    # The REAL capture already exercises the skip: images are 0-6, 8-12
    # (no "TestNERF 7.jpg"), so the matcher bridges the gap and the last
    # pose consumes image 12.
    res = convert_poses(
        poses_path=str(wheel_dataset / "poses.txt"),
        image_folder=str(wheel_dataset / "images_robot"),
        recenter=True, output=None, with_sharpness=False,
    )
    used = [f["file_path"] for f in res.train["frames"]]
    assert not any("TestNERF 7.jpg" in p for p in used)
    assert any("TestNERF 12.jpg" in p for p in used)
    assert len(used) == len(set(used)) == 11  # each image used once

    # Thin one more train image out → 11 poses, 10 candidates → error,
    # matching the reference's FileNotFoundError on exhaustion.
    cap = tmp_path / "cap"
    (cap / "images_robot").mkdir(parents=True)
    shutil.copy(wheel_dataset / "poses.txt", cap / "poses.txt")
    for i in [0, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11]:  # drop 12 (and 7 is absent)
        shutil.copy(
            wheel_dataset / "images_robot" / f"TestNERF {i}.jpg",
            cap / "images_robot" / f"TestNERF {i}.jpg",
        )
    with pytest.raises(FileNotFoundError):
        convert_poses(
            poses_path=str(cap / "poses.txt"),
            image_folder=str(cap / "images_robot"),
            recenter=True, output=None, with_sharpness=False,
        )
