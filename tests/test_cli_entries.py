"""Direct CLI-entry tests: parse_poses main (reference parser flags) and
colmap2nerf main."""

import json
import os

import numpy as np


def test_parse_poses_cli(wheel_dataset, tmp_path, capsys, monkeypatch):
    from nerf_kinematics_tpu.cli.parse_poses import main

    monkeypatch.chdir(tmp_path)
    main([
        "--poses", str(wheel_dataset / "poses.txt"),
        "--image_folder", str(wheel_dataset / "images_robot"),
        "--recenter", "--scale_trans", "1.0",
        "--output", "transforms.json",
        "--no_sharpness",
    ])
    out = capsys.readouterr().out
    assert "Wrote transforms.json with 11 training frames" in out
    assert "scale factor" in out
    for f in ("transforms.json", "transforms_val.json",
              "transforms_test.json", "transforms_test_video.json"):
        assert os.path.isfile(f), f
    data = json.loads(open("transforms.json").read())
    assert data["aabb_scale"] == 2.0 and len(data["frames"]) == 11


def test_colmap2nerf_cli(tmp_path, capsys, monkeypatch):
    from nerf_kinematics_tpu.cli.colmap2nerf import main
    from nerf_kinematics_tpu.poses.orbit import generate_orbit_poses
    from tests.test_colmap import _write_model

    poses = generate_orbit_poses(np.zeros(3), 3.0, 5)
    _write_model(tmp_path, poses)
    out_json = tmp_path / "t.json"
    monkeypatch.chdir(tmp_path)
    main(["--text", str(tmp_path), "--images", "images",
          "--out", str(out_json), "--no_sharpness"])
    printed = capsys.readouterr().out
    assert "wrote" in printed
    data = json.loads(out_json.read_text())
    assert len(data["frames"]) == 5
    assert "transform_matrix" in data["frames"][0]
