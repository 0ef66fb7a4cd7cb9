"""Config system: the reference YAML schema must load verbatim."""

import pathlib

import pytest

from nerf_kinematics_tpu.train.config import config_from_dict, config_to_dict, load_config

REF_LEGO = pathlib.Path("/root/reference/trained_models/nerf-pytorch/lego-lowres3/config.yml")
REF_WHEEL = pathlib.Path("/root/reference/trained_models/nerf-pytorch/wheel_robot6/config.yml")


@pytest.mark.parametrize("path", [REF_LEGO, REF_WHEEL])
def test_reference_config_loads_verbatim(path):
    if not path.exists():
        pytest.skip("reference configs not mounted")
    cfg = load_config(path)
    if "lego" in str(path):
        assert cfg.dataset.type == "blender"
        assert cfg.dataset.near == 2 and cfg.dataset.far == 6
        assert cfg.dataset.half_res is True
        assert cfg.experiment.train_iters == 200000
        assert cfg.model_coarse.num_encoding_fn_xyz == 10
        assert cfg.nerf.train.num_coarse == 64 and cfg.nerf.train.num_fine == 64
        assert cfg.nerf.num_random_rays == 1024
        assert cfg.nerf.train.radiance_field_noise_std == 0.2
        assert cfg.optimizer.lr == 0.005
    else:
        assert cfg.dataset.type == "robot"
        assert cfg.dataset.downsample_factor == 8
        assert cfg.dataset.llffhold == 8
        assert cfg.model_coarse.num_encoding_fn_xyz == 6
        assert cfg.nerf.train.num_fine == 128
        assert cfg.nerf.num_random_rays == 4096
        assert cfg.optimizer.lr == 0.001
    assert cfg.scheduler.lr_decay == 250
    assert cfg.scheduler.lr_decay_factor == 0.1
    assert cfg.nerf.validation.perturb is False


def test_roundtrip():
    raw = {
        "dataset": {"type": "blender", "near": 2, "far": 6, "basedir": "x"},
        "experiment": {"id": "t", "train_iters": 10},
        "models": {"coarse": {"num_encoding_fn_xyz": 6}},
        "nerf": {"train": {"num_random_rays": 512, "num_coarse": 32}},
        "optimizer": {"lr": 0.01},
        "scheduler": {"lr_decay": 100},
    }
    cfg = config_from_dict(raw)
    assert cfg.nerf.num_random_rays == 512
    d = config_to_dict(cfg)
    cfg2 = config_from_dict(d)
    assert cfg2 == cfg


def test_unknown_keys_rejected():
    with pytest.raises(ValueError):
        config_from_dict({"dataset": {"nonsense_key": 1}})


def test_all_shipped_configs_load():
    """Every YAML under configs/ parses into a valid Config."""
    import glob

    from nerf_kinematics_tpu.models.ngp import NGPConfig

    paths = sorted(glob.glob("configs/*.yml"))
    assert len(paths) >= 6
    for p in paths:
        cfg = load_config(p)
        if cfg.engine == "ngp":
            assert isinstance(cfg.ngp, NGPConfig)
        # fox_ngp keeps the reference's exact hash-grid dims available.
        if "fox_ngp" in p:
            assert cfg.ngp.grid.n_levels == 8
            assert cfg.ngp.grid.table_size == 2**19
            assert cfg.ngp.density_width == 64 and cfg.ngp.color_layers == 4
