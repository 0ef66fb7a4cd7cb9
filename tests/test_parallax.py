"""Parallax-analysis tests: golden directional_std on the real wheel capture,
low- vs high-parallax discrimination, table/plot outputs."""

import numpy as np
import pytest

from nerf_kinematics_tpu.metrics.parallax import (
    analyze_poses,
    analyze_transforms_json,
    plot_pose_clouds,
    summary_table,
)
from nerf_kinematics_tpu.poses.orbit import generate_orbit_poses


@pytest.fixture(scope="module")
def wheel_train_poses(wheel_dataset):
    from nerf_kinematics_tpu.poses.pipeline import convert_poses

    res = convert_poses(
        poses_path=str(wheel_dataset / "poses.txt"),
        image_folder=str(wheel_dataset / "images_robot"),
        recenter=True, scale_trans=1.0, output=None, with_sharpness=False,
    )
    return np.asarray([f["transform_matrix"] for f in res.train["frames"]])


def test_wheel_golden_directional_std(wheel_train_poses):
    """paralaje.ipynb cell-0 output: wheel directional_std 0.1327, 11 frames."""
    m = analyze_poses(wheel_train_poses, "wheel")
    assert m.num_frames == 11
    assert m.directional_std == pytest.approx(0.13272, abs=2e-4)


def test_low_vs_high_parallax_discrimination(wheel_train_poses):
    """An orbit capture (fox/lego-like) must score far higher directional
    diversity than the near-planar robot capture — the thesis's core
    diagnostic."""
    orbit = generate_orbit_poses(np.zeros(3), radius=2.0, n_poses=12)
    m_wheel = analyze_poses(wheel_train_poses, "wheel")
    m_orbit = analyze_poses(orbit, "orbit")
    assert m_orbit.directional_std > 3 * m_wheel.directional_std
    assert m_orbit.mean_distance > m_wheel.mean_distance * 0.5  # both sane
    assert 0 < m_wheel.spatial_range <= 1.0 + 1e-9


def test_analyze_transforms_json(wheel_dataset, tmp_path):
    from nerf_kinematics_tpu.poses.pipeline import convert_poses

    out = tmp_path / "transforms.json"
    convert_poses(
        poses_path=str(wheel_dataset / "poses.txt"),
        image_folder=str(wheel_dataset / "images_robot"),
        recenter=True, output=str(out), with_sharpness=False,
    )
    m = analyze_transforms_json(str(out), "wheel")
    assert m.num_frames == 11
    assert m.directional_std == pytest.approx(0.13272, abs=2e-4)


def test_summary_table_and_plot(tmp_path):
    orbit = generate_orbit_poses(np.zeros(3), 2.0, 8)
    ring2 = generate_orbit_poses(np.ones(3), 1.0, 6)
    ms = [analyze_poses(orbit, "a"), analyze_poses(ring2, "b")]
    table = summary_table(ms)
    assert "directional_std" in table and "a" in table and "b" in table

    path = str(tmp_path / "paralaje.png")
    plot_pose_clouds([("a", orbit), ("b", ring2)], path)
    import os

    assert os.path.getsize(path) > 1000
