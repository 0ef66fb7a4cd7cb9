"""The lego-class "machina" benchmark scene: writer format, loader roundtrip,
idempotence, and GT self-consistency (SURVEY.md §6 north-star workload)."""

import json
import os

import numpy as np
import pytest

from nerf_kinematics_tpu.data import load_dataset
from nerf_kinematics_tpu.data.machina import (
    CAMERA_ANGLE_X,
    hemisphere_poses,
    machina_field,
    orbit_poses,
    render_view,
    write_machina_dataset,
)
from nerf_kinematics_tpu.train.config import DatasetConfig


@pytest.fixture(scope="module")
def tiny_machina(tmp_path_factory):
    out = tmp_path_factory.mktemp("machina")
    write_machina_dataset(
        str(out), resolution=48, n_train=3, n_val=1, n_test=1, n_samples=96
    )
    return out


def test_writer_blender_format(tiny_machina):
    for split, n in (("train", 3), ("val", 1), ("test", 1)):
        meta = json.loads((tiny_machina / f"transforms_{split}.json").read_text())
        assert meta["camera_angle_x"] == CAMERA_ANGLE_X
        assert len(meta["frames"]) == n
        for fr in meta["frames"]:
            assert os.path.isfile(str(tiny_machina / (fr["file_path"] + ".png")))
            m = np.asarray(fr["transform_matrix"])
            assert m.shape == (4, 4)
            # Valid rotation (the reference's nerf_loader normalizes det!=1).
            assert np.linalg.det(m[:3, :3]) == pytest.approx(1.0, abs=1e-4)


def test_loader_roundtrip_and_white_background(tiny_machina):
    cfg = DatasetConfig(basedir=str(tiny_machina), type="blender", near=2, far=6)
    white = load_dataset(cfg, white_background=True)
    black = load_dataset(cfg)
    assert white.images.shape == (5, 48, 48, 3)
    # Background pixels (corner rays miss the object) composite to bg color.
    assert white.images[0, 0, 0] == pytest.approx([1, 1, 1], abs=0.02)
    assert black.images[0, 0, 0] == pytest.approx([0, 0, 0], abs=0.02)
    # Object pixels are identical either way (opaque).
    c = 24
    assert np.allclose(white.images[0, c, c], black.images[0, c, c], atol=0.05)


def test_writer_idempotent(tiny_machina):
    p = tiny_machina / "train" / "r_0.png"
    mtime = p.stat().st_mtime
    write_machina_dataset(
        str(tiny_machina), resolution=48, n_train=3, n_val=1, n_test=1, n_samples=96
    )
    assert p.stat().st_mtime == mtime  # marker short-circuits re-render


def test_field_properties():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, (256, 3)).astype(np.float32)
    rgb, sigma = machina_field(pts)
    rgb, sigma = np.asarray(rgb), np.asarray(sigma)
    assert rgb.shape == (256, 3) and sigma.shape == (256,)
    assert (rgb >= 0).all() and (rgb <= 1).all() and (sigma >= 0).all()
    # Far outside the rig: empty space.
    far_rgb, far_sigma = machina_field(np.array([[0.0, 0.0, 3.0]], np.float32))
    assert float(far_sigma[0]) < 1e-3
    # Inside the cabin block: solid.
    _, in_sigma = machina_field(np.array([[-0.55, 0.0, -0.2]], np.float32))
    assert float(in_sigma[0]) > 100.0


def test_multiview_photo_consistency():
    """Two GT views of the same surface point agree in color (Lambertian
    field ⇒ any consistent NeRF can fit it)."""
    H = W = 32
    focal = 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)
    # Look straight down the +Z axis from two nearby azimuths: center pixel
    # sees the arm/plate region in both.
    poses = orbit_poses(8, elev_deg=88.0)
    a, acc_a = render_view(poses[0], H, W, focal, 128)
    b, acc_b = render_view(poses[1], H, W, focal, 128)
    a, b = np.asarray(a), np.asarray(b)
    # Center pixel: both look at the same top surface from ~the same ray.
    assert np.allclose(a[H // 2, W // 2], b[H // 2, W // 2], atol=0.15)
    assert float(np.asarray(acc_a)[H // 2, W // 2]) > 0.95


def test_pose_distributions():
    tr = hemisphere_poses(16, seed=1)
    assert tr.shape == (16, 4, 4)
    pos = tr[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(pos, axis=1), 4.0311289, rtol=1e-5)
    assert (pos[:, 2] > 0).all()  # upper hemisphere
