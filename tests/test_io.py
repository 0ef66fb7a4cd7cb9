"""Persistence tests: orbax checkpoint roundtrip, legacy torch import/export
(against the real reference checkpoints when mounted), compressed snapshots."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.io import (
    CheckpointManager,
    export_legacy_checkpoint,
    flax_to_torch_state_dict,
    import_legacy_checkpoint,
    load_snapshot,
    save_snapshot,
    torch_state_dict_to_flax,
)
from nerf_kinematics_tpu.models import FlexibleNeRF, FlexibleNeRFConfig

REF_CKPT = pathlib.Path(
    "/root/reference/trained_models/nerf-pytorch/lego-lowres3/checkpoint110000.ckpt"
)


def _params(cfg=FlexibleNeRFConfig(), seed=0):
    model = FlexibleNeRF(cfg)
    return model, model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 3)), jnp.zeros((1, 3)))


def test_orbax_roundtrip(tmp_path):
    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.loop import ClassicNerf

    engine = ClassicNerf(Config(model_coarse=FlexibleNeRFConfig(hidden_size=32)))
    state = engine.init_state(0)
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(100, state, {"loss": 0.5})
    assert mgr.latest_step() == 100
    restored, step = mgr.restore(state)
    assert step == 100
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_legacy_roundtrip(tmp_path):
    _, params = _params()
    path = tmp_path / "checkpoint42.ckpt"
    export_legacy_checkpoint(str(path), 42, params, params, loss=0.1, psnr=20.0)
    back = import_legacy_checkpoint(str(path))
    assert back["step"] == 42 and back["psnr"] == 20.0
    for mod, leaves in params["params"].items():
        for leaf, arr in leaves.items():
            np.testing.assert_allclose(
                back["params_coarse"]["params"][mod][leaf], np.asarray(arr), rtol=1e-6
            )


def test_import_real_reference_checkpoint():
    """The actual thesis checkpoint must import into our model and run —
    PSNR-parity evaluation path (SURVEY.md §7 step 2)."""
    if not REF_CKPT.exists():
        pytest.skip("reference checkpoint not mounted")
    legacy = import_legacy_checkpoint(str(REF_CKPT))
    assert legacy["step"] == 110000
    assert legacy["psnr"] == pytest.approx(21.0197, abs=1e-3)

    model = FlexibleNeRF(FlexibleNeRFConfig())
    xyz = jnp.array([[0.1, 0.2, 0.3], [0.0, 0.0, 0.0]])
    vd = jnp.array([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    rgb, sigma = model.apply(legacy["params_coarse"], xyz, vd)
    assert rgb.shape == (2, 3) and sigma.shape == (2,)
    assert np.isfinite(np.asarray(rgb)).all()
    rgb_f, _ = model.apply(legacy["params_fine"], xyz, vd)
    # Coarse and fine are different trained models.
    assert not np.allclose(np.asarray(rgb), np.asarray(rgb_f))


def test_torch_name_mapping_roundtrip():
    _, params = _params(FlexibleNeRFConfig(num_encoding_fn_xyz=6))
    sd = flax_to_torch_state_dict(params)
    assert "layers_xyz.0.weight" in sd and "layers_dir.0.weight" in sd
    assert sd["layer1.weight"].shape == (128, 39)  # torch (out, in)
    back = torch_state_dict_to_flax(sd)
    for mod, leaves in params["params"].items():
        for leaf, arr in leaves.items():
            np.testing.assert_array_equal(back["params"][mod][leaf], np.asarray(arr))


def test_snapshot_roundtrip(tmp_path):
    _, params = _params(FlexibleNeRFConfig(hidden_size=32))
    path = str(tmp_path / "model.nktsnap")
    save_snapshot(path, params, {"step": 7, "scene": "lego"})
    state, meta = load_snapshot(path)
    assert meta == {"step": 7, "scene": "lego"}
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_snapshot_rejects_garbage(tmp_path):
    p = tmp_path / "bad.snap"
    p.write_bytes(b"not a snapshot")
    with pytest.raises(ValueError):
        load_snapshot(str(p))


def test_restore_migrates_per_leaf_optimizer_layout(tmp_path):
    """Checkpoints written with the pre-flatten optimizer (per-leaf Adam
    mu/nu trees) must restore into the current flattened layout exactly:
    ravel_pytree order is tree_flatten order, so the migrated flat moments
    equal ravel_pytree of the saved trees (io/checkpoint._adapt_tree)."""
    import optax
    from jax.flatten_util import ravel_pytree

    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.loop import ClassicNerf, lr_schedule

    cfg = Config(model_coarse=FlexibleNeRFConfig(hidden_size=32))
    engine = ClassicNerf(cfg)
    state = engine.init_state(0)

    # Re-create the OLD layout: plain per-leaf adam, stepped once so the
    # moments are non-trivial.
    old_tx = optax.adam(learning_rate=lr_schedule(cfg))
    old_opt = old_tx.init(state.params)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-3) + 0.05 * p, state.params
    )
    updates, old_opt = old_tx.update(grads, old_opt, state.params)
    old_params = optax.apply_updates(state.params, updates)
    old_state = state._replace(params=old_params, opt_state=old_opt, step=7)

    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(7, old_state)

    # Restore into the CURRENT (flattened) state structure.
    restored, step = mgr.restore(engine.init_state(1))
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(old_params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The migrated flat moments equal ravel_pytree of the per-leaf trees.
    adam_state = next(s for s in jax.tree_util.tree_leaves(
        restored.opt_state, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(x := s, "mu"))
    old_adam = next(s for s in jax.tree_util.tree_leaves(
        old_opt, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(x := s, "mu"))
    np.testing.assert_allclose(
        np.asarray(adam_state.mu), np.asarray(ravel_pytree(old_adam.mu)[0]))
    np.testing.assert_allclose(
        np.asarray(adam_state.nu), np.asarray(ravel_pytree(old_adam.nu)[0]))
    mgr.close()


def test_restore_pre_ema_checkpoint_with_ema_on(tmp_path):
    """A checkpoint saved WITHOUT an EMA shadow (ema=None) must restore into
    a target that keeps one (ema_decay > 0): the shadow is seeded from the
    restored params instead of erroring (ADVICE r3 medium). The seeded
    shadow must also not alias the param buffers (donation safety)."""
    import dataclasses

    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.loop import ClassicNerf

    cfg = Config(model_coarse=FlexibleNeRFConfig(hidden_size=32))
    engine = ClassicNerf(cfg)
    old_state = engine.init_state(0)
    assert old_state.ema is None
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(3, old_state)

    ema_cfg = cfg.replace(nerf=dataclasses.replace(cfg.nerf, ema_decay=0.95))
    ema_engine = ClassicNerf(ema_cfg)
    target = ema_engine.init_state(1)
    assert target.ema is not None
    restored, step = mgr.restore(target)
    assert step == 3
    for saved, p, e in zip(jax.tree_util.tree_leaves(old_state.params),
                           jax.tree_util.tree_leaves(restored.params),
                           jax.tree_util.tree_leaves(restored.ema)):
        np.testing.assert_array_equal(np.asarray(saved), np.asarray(p))
        np.testing.assert_array_equal(np.asarray(saved), np.asarray(e))
        assert p.unsafe_buffer_pointer() != e.unsafe_buffer_pointer()
    mgr.close()


def test_restore_falls_back_past_corrupted_latest(tmp_path, caplog):
    """Auto-resume with a corrupted/stripped latest checkpoint must fall
    back to the newest readable one (warning logged), and return
    (None, None) when nothing restores — not crash the run at startup
    (observed live: a data-stripped orbax dir killed Trainer.init_or_resume)."""
    import logging
    import shutil

    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.loop import ClassicNerf

    cfg = Config(model_coarse=FlexibleNeRFConfig(hidden_size=16))
    engine = ClassicNerf(cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    s1 = engine.init_state(1)
    mgr.save(5, s1)
    mgr.save(9, engine.init_state(2))
    # Strip the latest checkpoint's data blobs (keep the metadata shell).
    ddir = tmp_path / "ckpts" / "9" / "default" / "d"
    assert ddir.exists()
    shutil.rmtree(ddir)

    with caplog.at_level(logging.WARNING, "nerf_kinematics_tpu.io"):
        restored, step = mgr.restore(engine.init_state(0))
    assert step == 5
    assert any("unreadable" in r.message for r in caplog.records)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # All-corrupt -> fresh start.
    shutil.rmtree(tmp_path / "ckpts" / "5" / "default" / "d")
    restored, step = mgr.restore(engine.init_state(0))
    assert restored is None and step is None
    mgr.close()
