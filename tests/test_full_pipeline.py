"""End-to-end pipeline test on the REAL robot capture: convert → diagnose →
train (tiny) → video → mesh → report. The thesis's whole workflow in one
call (BASELINE.json config 5), sized for CPU."""

import json
import os

import pytest


def test_full_pipeline_on_wheel(wheel_dataset, tmp_path):
    from nerf_kinematics_tpu.cli.full_pipeline import main

    out = str(tmp_path / "run")
    report = main([
        "--capture", str(wheel_dataset),
        "--out", out,
        "--steps", "30",
        "--batch", "256",
        "--samples", "16",
        "--fine-samples", "0",
        "--downsample", "16",
        "--mesh-res", "24",
        "--video-frames", "2",
    ])

    assert os.path.isfile(os.path.join(out, "transforms.json"))
    assert os.path.isfile(os.path.join(out, "transforms_test_video.json"))
    assert os.path.isfile(os.path.join(out, "parallax.json"))
    assert os.path.isfile(os.path.join(out, "scene.ply"))
    assert os.path.isfile(os.path.join(out, "report.json"))
    vids = [f for f in os.listdir(out) if f.endswith((".mp4", ".gif"))]
    assert vids, "no video written"

    rep = json.loads(open(os.path.join(out, "report.json")).read())
    # The wheel capture must trip the low-parallax warning (the thesis result).
    assert rep["low_parallax_warning"] is True
    assert rep["parallax"]["num_frames"] == 11
