"""End-to-end smoke: a tiny classic-NeRF run on the procedural synthetic scene
must converge (loss down, PSNR up) — the minimum end-to-end slice of
SURVEY.md §7 step 3, sized for CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.data import make_synthetic_scene
from nerf_kinematics_tpu.metrics import psnr
from nerf_kinematics_tpu.models.flexible_nerf import FlexibleNeRFConfig
from nerf_kinematics_tpu.rendering.renderer import RenderSettings
from nerf_kinematics_tpu.train.config import Config, NeRFConfig, OptimizerConfig
from nerf_kinematics_tpu.train.loop import ClassicNerf


@pytest.fixture(scope="module")
def tiny_setup():
    ds = make_synthetic_scene(n_views=9, resolution=32)
    small = FlexibleNeRFConfig(
        num_layers=8, hidden_size=64, num_encoding_fn_xyz=6, num_encoding_fn_dir=4
    )
    cfg = Config(
        model_coarse=small,
        model_fine=None,
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=32, num_fine=0, perturb=True),
            validation=RenderSettings(num_coarse=32, num_fine=0, perturb=False),
            num_random_rays=512,
        ),
        optimizer=OptimizerConfig(lr=5e-3),
    )
    engine = ClassicNerf(cfg)
    state = engine.init_state(seed=0)
    return ds, engine, state


def test_train_step_decreases_loss(tiny_setup):
    ds, engine, state = tiny_setup
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, ds.use_ndc, donate=False)

    first_loss = None
    for i in range(150):
        state, metrics = step(state, images, poses)
        if i == 0:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert np.isfinite(first_loss) and np.isfinite(last_loss)
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)

    # Validation render beats a gray-image baseline PSNR by a clear margin.
    render = engine.make_render_fn(ds.intrinsics, ds.near, ds.far, ds.use_ndc)
    val_img = np.asarray(render(state.params, poses[int(ds.val_idx[0])])["rgb"])
    gt = ds.images[int(ds.val_idx[0])]
    p = psnr(val_img, gt)
    baseline = psnr(np.full_like(gt, gt.mean()), gt)
    assert p > baseline + 2.0, (p, baseline)
    assert p > 14.0, p


def test_train_metrics_finite_and_psnr_consistent(tiny_setup):
    ds, engine, state = tiny_setup
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, ds.use_ndc, donate=False)
    state, m = step(state, images, poses)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(
        float(m["psnr"]), -10 * np.log10(float(m["loss_fine"])), rtol=1e-5
    )


def test_lr_schedule_decay():
    from nerf_kinematics_tpu.train.loop import lr_schedule

    cfg = Config()
    sched = lr_schedule(cfg)
    assert sched(0) == pytest.approx(cfg.optimizer.lr)
    # After lr_decay*1000 steps, lr has decayed by lr_decay_factor.
    assert sched(250_000) == pytest.approx(cfg.optimizer.lr * 0.1)


def test_fit_logs_val_mean(tmp_path):
    """Trainer.fit ends with a val/psnr_mean scalar over the whole val
    split (view-0 val/psnr alone has ±0.4 dB run-to-run spread)."""
    import dataclasses
    import json
    import os

    from nerf_kinematics_tpu.data.synthetic import make_synthetic_scene
    from nerf_kinematics_tpu.models.flexible_nerf import FlexibleNeRFConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import (
        Config,
        ExperimentConfig,
        NeRFConfig,
    )
    from nerf_kinematics_tpu.train.trainer import Trainer

    ds = make_synthetic_scene(n_views=6, resolution=16)
    assert len(ds.val_idx) > 1
    m = FlexibleNeRFConfig(num_layers=2, hidden_size=8,
                           num_encoding_fn_xyz=2, num_encoding_fn_dir=1)
    cfg = Config(
        model_coarse=m, model_fine=None,
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=4, num_fine=0),
            validation=RenderSettings(num_coarse=4, num_fine=0,
                                      perturb=False),
            num_random_rays=32,
        ),
        experiment=ExperimentConfig(id="valmean", logdir=str(tmp_path),
                                    train_iters=4, print_every=2,
                                    validate_every=0, save_every=0),
    )
    t = Trainer(cfg, dataset=ds)
    t.fit()
    t.close()
    tags = [json.loads(line)["tag"]
            for line in open(os.path.join(str(tmp_path), "valmean",
                                          "metrics.jsonl"))]
    assert "val/psnr_mean" in tags


def test_param_ema_tracks_manual_average(tiny_setup):
    """nerf.ema_decay > 0 keeps an EMA shadow of the params in
    TrainState.ema (instant-ngp's Ema-wrapped optimizer, base.json), updated
    as ema = d*ema + (1-d)*params each step and initialized at the init
    params; eval_params() selects it. Verified against a manual recurrence
    over the live param trajectory."""
    import dataclasses

    from nerf_kinematics_tpu.train.loop import eval_params

    ds, engine0, _ = tiny_setup
    d = 0.9
    cfg = engine0.cfg.replace(
        nerf=dataclasses.replace(engine0.cfg.nerf, ema_decay=d)
    )
    engine = ClassicNerf(cfg)
    state = engine.init_state(seed=0)
    assert state.ema is not None
    # The shadow must be a COPY of params, not an alias: the production
    # step donates the state, and donating the same device buffer from two
    # tree positions fails at dispatch on TPU (ADVICE r3 high).
    for e, p in zip(jax.tree_util.tree_leaves(state.ema),
                    jax.tree_util.tree_leaves(state.params)):
        assert e.unsafe_buffer_pointer() != p.unsafe_buffer_pointer()
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    # donate=True: the production path (Trainer.fit / make_train_many).
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, ds.use_ndc,
                                  donate=True)

    # Deep copy: donation invalidates the original param buffers.
    manual = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                    state.params)
    for _ in range(5):
        state, _metrics = step(state, images, poses)
        manual = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1 - d), manual, state.params
        )
    for got, want in zip(
        jax.tree_util.tree_leaves(state.ema), jax.tree_util.tree_leaves(manual)
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    # The shadow is what eval uses, and it differs from the live params.
    assert eval_params(state) is state.ema
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(state.ema),
                        jax.tree_util.tree_leaves(state.params))
    ]
    assert max(diffs) > 0.0


def test_ema_off_keeps_state_structure(tiny_setup):
    """Default ema_decay=0 leaves TrainState.ema = None — the pytree
    structure (and thus orbax checkpoints and jit caches) is unchanged."""
    ds, engine, state = tiny_setup
    assert state.ema is None
    from nerf_kinematics_tpu.train.loop import eval_params

    assert eval_params(state) is state.params
