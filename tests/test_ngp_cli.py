"""End-to-end test of the NGP testbed CLI (reference scripts/run.py parity):
train → snapshot → reload → test_transforms PSNR → screenshots → mesh."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from nerf_kinematics_tpu.cli.ngp_run import main
from nerf_kinematics_tpu.data import make_synthetic_scene
from nerf_kinematics_tpu.poses.pipeline import base_transforms_dict


@pytest.fixture(scope="module")
def ngp_scene(tmp_path_factory):
    """Synthetic scene written to disk in instant-ngp transforms.json format."""
    root = tmp_path_factory.mktemp("scene")
    ds = make_synthetic_scene(n_views=8, resolution=24)
    (root / "images").mkdir()

    fov = 2 * np.arctan(0.5 * 24 / ds.intrinsics.fl_x)
    base = base_transforms_dict(24, 24, np.degrees(fov), np.degrees(fov),
                                0, 0, 0, 0, aabb_scale=4.0)

    def write(path, idxs, with_images=True):
        meta = dict(base)
        meta["frames"] = []
        for i in idxs:
            name = f"images/im_{i}.png"
            if with_images:
                img = (ds.images[i] * 255).astype(np.uint8)
                Image.fromarray(img).save(root / name)
            meta["frames"].append(
                {"file_path": f"./{name}", "transform_matrix": ds.poses[i].tolist()}
            )
        (root / path).write_text(json.dumps(meta))

    write("transforms.json", range(6))
    write("transforms_val.json", [6])
    write("transforms_test.json", [7])
    return root, ds


def test_full_cli_pipeline(ngp_scene, tmp_path, capsys, monkeypatch):
    root, ds = ngp_scene
    monkeypatch.chdir(tmp_path)
    snap = str(tmp_path / "model.nktsnap")

    main([str(root), "--n_steps", "60", "--batch", "256",
          "--samples", "16", "--fine-samples", "16",
          "--save_snapshot", snap, "--mode", "nerf"])
    out = capsys.readouterr().out
    assert "no longer in use" in out  # --mode deprecation warning
    assert os.path.isfile(snap)

    # Reload snapshot; evaluate on the val transforms (images next to JSON).
    main([str(root), "--load_snapshot", snap,
          "--samples", "16", "--fine-samples", "16",
          "--test_transforms", str(root / "transforms_val.json")])
    out = capsys.readouterr().out
    assert "mean psnr" in out

    # Screenshots.
    shots = str(tmp_path / "shots")
    main([str(root), "--load_snapshot", snap,
          "--samples", "16", "--fine-samples", "16",
          "--screenshot_transforms", str(root / "transforms_test.json"),
          "--screenshot_dir", shots])
    assert len(os.listdir(shots)) == 1

    # Mesh export at low res.
    mesh = str(tmp_path / "scene.ply")
    main([str(root), "--load_snapshot", snap, "--save_mesh", mesh,
          "--samples", "16", "--fine-samples", "16",
          "--marching_cubes_res", "24",
          "--marching_cubes_density_thresh", "2.0"])
    assert os.path.isfile(mesh)


def test_config_flag_keeps_yaml_step_budget(ngp_scene, tmp_path):
    """--config supplies the whole recipe: without --n_steps the YAML's
    train_iters must survive (regression: the argparse default 0 used to
    clobber it to max(0, 1) = 1), and --n_steps still overrides."""
    import yaml

    from nerf_kinematics_tpu.cli.ngp_run import _make_trainer, build_parser

    cfg = {
        "engine": "ngp",
        "ngp": {"encoder": "cp",
                "cp": {"n_levels": 2, "n_components": 4,
                       "base_resolution": 8, "max_resolution": 16,
                       "table_size": 16}},
        "nerf": {"num_random_rays": 64,
                 "train": {"num_coarse": 8, "num_fine": 0},
                 "validation": {"num_coarse": 8, "num_fine": 0}},
        "experiment": {"id": "cfg", "logdir": str(tmp_path),
                       "train_iters": 77},
    }
    path = tmp_path / "recipe.yml"
    path.write_text(yaml.safe_dump(cfg))

    root, _ = ngp_scene
    t = _make_trainer(build_parser().parse_args(
        [str(root), "--config", str(path)]))
    assert t.cfg.experiment.train_iters == 77
    t2 = _make_trainer(build_parser().parse_args(
        [str(root), "--config", str(path), "--n_steps", "5"]))
    assert t2.cfg.experiment.train_iters == 5
