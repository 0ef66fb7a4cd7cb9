"""Trainer + CLI end-to-end: train the synthetic smoke config for a few
hundred iterations through the real CLI path, with checkpointing and resume."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture()
def smoke_cfg(tmp_path):
    with open("configs/synthetic_smoke.yml") as f:
        raw = yaml.safe_load(f)
    raw["experiment"]["logdir"] = str(tmp_path / "logs")
    raw["experiment"]["train_iters"] = 120
    raw["experiment"]["save_every"] = 60
    raw["experiment"]["validate_every"] = 60
    raw["experiment"]["print_every"] = 60
    raw["nerf"]["train"]["num_random_rays"] = 256
    path = tmp_path / "smoke.yml"
    path.write_text(yaml.safe_dump(raw))
    return path, tmp_path


def test_cli_train_validate_checkpoint_resume(smoke_cfg):
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer

    cfg_path, tmp = smoke_cfg
    cfg = load_config(cfg_path)
    trainer = Trainer(cfg, export_legacy=True)
    result = trainer.fit()
    assert result.val_psnr is not None and np.isfinite(result.val_psnr)
    assert result.rays_per_sec and result.rays_per_sec > 0

    rundir = trainer.rundir
    assert os.path.isfile(os.path.join(rundir, "metrics.jsonl"))
    assert os.path.isfile(os.path.join(rundir, "checkpoint120.ckpt"))  # legacy export
    assert trainer.ckpt.latest_step() == 120
    trainer.close()

    # Resume: a fresh trainer picks up at 120 and continues to 150.
    trainer2 = Trainer(cfg)
    state = trainer2.init_or_resume()
    assert int(state.step) == 120
    result2 = trainer2.fit(max_iters=150)
    assert int(result2.state.step) == 150
    trainer2.close()


def test_cli_eval_entry(smoke_cfg, capsys):
    from nerf_kinematics_tpu.cli.run_nerf import main

    cfg_path, tmp = smoke_cfg
    main(["--config", str(cfg_path), "--max-iters", "60"])
    out = capsys.readouterr().out
    assert "val_psnr" in out or "throughput" in out

    main(["--config", str(cfg_path), "--eval"])
    out = capsys.readouterr().out
    assert "val_psnr" in out


def test_plot_metrics(smoke_cfg, capsys):
    """metrics.jsonl → train/val loss+psnr curve PNGs."""
    import os

    from nerf_kinematics_tpu.cli.plot_metrics import main as plot_main
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer

    cfg_path, tmp = smoke_cfg
    cfg = load_config(cfg_path)
    trainer = Trainer(cfg)
    trainer.fit(max_iters=60)
    trainer.close()

    plot_main([trainer.rundir])
    out = capsys.readouterr().out
    lossdir = os.path.join(trainer.rundir, "loss")
    files = set(os.listdir(lossdir))
    assert {"train_loss.png", "train_psnr.png", "val_loss.png", "val_psnr.png"} <= files


def test_silent_run_print_every_zero(smoke_cfg):
    """print_every: 0 (silent run) must not crash with ZeroDivisionError and
    must be consistent with the other cadence guards."""
    import yaml as _yaml

    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer

    cfg_path, tmp = smoke_cfg
    raw = _yaml.safe_load(cfg_path.read_text())
    raw["experiment"]["print_every"] = 0
    raw["experiment"]["validate_every"] = 0
    raw["experiment"]["save_every"] = 0
    silent = tmp / "silent.yml"
    silent.write_text(_yaml.safe_dump(raw))
    trainer = Trainer(load_config(str(silent)))
    result = trainer.fit(max_iters=40)
    assert int(result.state.step) == 40
    trainer.close()
