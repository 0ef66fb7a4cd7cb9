"""PSNR parity against the actual thesis artifacts: import the reference's
trained wheel checkpoint and validate it through OUR loader + renderer.

The reference stored val PSNR 8.82 dB at iter 110000
(trained_models/nerf-pytorch/wheel_robot6/checkpoint110000.ckpt `psnr` key).
Rendering the same checkpoint through this framework's robot loader, ray
generator, NDC warp, hierarchical sampler and compositor reproduces the
low-parallax failure mode within the 0.5 dB parity budget — strong evidence
the whole classic path matches the reference semantics."""

import pathlib

import pytest

WHEEL_CFG = pathlib.Path(
    "/root/reference/trained_models/nerf-pytorch/wheel_robot6/config.yml"
)
WHEEL_CKPT = pathlib.Path(
    "/root/reference/trained_models/nerf-pytorch/wheel_robot6/checkpoint110000.ckpt"
)


@pytest.mark.skipif(
    not (WHEEL_CFG.exists() and WHEEL_CKPT.exists()),
    reason="reference artifacts not mounted",
)
def test_wheel_checkpoint_psnr_parity():
    import dataclasses

    from nerf_kinematics_tpu.io.torch_compat import import_legacy_checkpoint
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer

    cfg = load_config(WHEEL_CFG)
    cfg = cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset,
            basedir="/root/reference/datasets/nerf-raw/wheel_real_robot",
        )
    )
    trainer = Trainer(cfg)
    legacy = import_legacy_checkpoint(str(WHEEL_CKPT))
    state = trainer.engine.init_state()
    params = dict(state.params)
    params["coarse"] = legacy["params_coarse"]
    params["fine"] = legacy["params_fine"]
    v = trainer.validate(state._replace(params=params))

    stored = legacy["psnr"]  # 8.8197
    assert stored == pytest.approx(8.8197, abs=1e-3)
    # Parity budget: within 0.5 dB of the reference's own number.
    assert v["val_psnr"] == pytest.approx(stored, abs=0.5), v["val_psnr"]
    # And the failure mode itself: low-parallax capture stays under 10 dB.
    assert v["val_psnr"] < 10.0
    trainer.close()
