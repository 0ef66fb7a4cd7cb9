"""Shuffled pixel-sampler tests: the precomputed ray buffer must contain
exactly the per-pixel rays/targets of the random path (same camera model),
just globally permuted, and the train step must consume it."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.cameras.rays import get_rays
from nerf_kinematics_tpu.train.loop import build_shuffled_ray_buffer


class _Intr:
    def __init__(self, h, w, fl):
        self.height, self.width = h, w
        self.fl_x = self.fl_y = fl
        self.cx, self.cy = w / 2.0, h / 2.0


def _poses(n):
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    return jnp.asarray(poses)


def test_buffer_matches_get_rays():
    H, W, n = 6, 5, 3
    intr = _Intr(H, W, 7.0)
    poses = _poses(n)
    images = jnp.asarray(
        np.random.default_rng(1).random((n, H, W, 3)).astype(np.float32)
    )
    buf = build_shuffled_ray_buffer(images, poses, intr, seed=3)
    assert buf["rays_o"].shape == (n * H * W, 3)

    # Reconstruct the unshuffled reference: per-image get_rays + pixels.
    ref_o, ref_d, ref_t = [], [], []
    for i in range(n):
        ro, rd = get_rays(H, W, intr.fl_x, poses[i], cx=intr.cx, cy=intr.cy)
        ref_o.append(np.asarray(ro).reshape(-1, 3))
        ref_d.append(np.asarray(rd).reshape(-1, 3))
        ref_t.append(np.asarray(images[i]).reshape(-1, 3))
    ref = {
        "rays_o": np.concatenate(ref_o),
        "rays_d": np.concatenate(ref_d),
        "target": np.concatenate(ref_t),
    }
    # The buffer must be a permutation of the reference rows, with the SAME
    # permutation across all three arrays (row-wise correspondence).
    perm = np.asarray(
        jax.random.permutation(jax.random.PRNGKey(3), n * H * W)
    )
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(buf[k]), ref[k][perm], rtol=1e-5, atol=1e-6,
            err_msg=k,
        )


def test_shuffled_step_trains():
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.loop import ClassicNerf

    H, W, n = 8, 8, 2
    intr = _Intr(H, W, 9.0)
    poses = _poses(n)
    images = jnp.asarray(
        np.random.default_rng(2).random((n, H, W, 3)).astype(np.float32)
    )
    settings = RenderSettings(num_coarse=4, num_fine=0, perturb=True,
                              pixel_sampler="shuffled")
    cfg = Config(nerf=dataclasses.replace(
        Config().nerf, train=settings, num_random_rays=16,
    ))
    engine = ClassicNerf(cfg)
    step = engine.make_train_step(intr, 0.5, 3.5, False, donate=False)
    state = engine.init_state(0)
    buf = build_shuffled_ray_buffer(images, poses, intr, seed=0)
    s1, m1 = step(state, images, poses, buf)
    s2, m2 = step(s1, images, poses, buf)
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 2
    # Missing buffer must raise, not silently fall back.
    bad = ClassicNerf(cfg).make_train_step(intr, 0.5, 3.5, False,
                                           donate=False)
    with pytest.raises(ValueError, match="shuffled"):
        bad(state, images, poses)


def test_shuffled_windows_vary_per_step():
    """Consecutive steps draw different random windows (batch composition
    must not repeat per epoch — sequential consumption measurably degrades
    long runs, see sample_batch_shuffled)."""
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.loop import ClassicNerf

    H, W, n = 8, 8, 2
    intr = _Intr(H, W, 9.0)
    poses = _poses(n)
    images = jnp.asarray(
        np.random.default_rng(5).random((n, H, W, 3)).astype(np.float32)
    )
    settings = RenderSettings(num_coarse=4, num_fine=0, perturb=True,
                              pixel_sampler="shuffled")
    cfg = Config(nerf=dataclasses.replace(
        Config().nerf, train=settings, num_random_rays=16,
    ))
    engine = ClassicNerf(cfg)
    step = engine.make_train_step(intr, 0.5, 3.5, False, donate=False)
    buf = build_shuffled_ray_buffer(images, poses, intr, seed=0)
    state = engine.init_state(0)
    losses = []
    for _ in range(4):
        state, m = step(state, images, poses, buf)
        losses.append(float(m["loss"]))
    # Different random windows → different batches → different losses.
    assert len(set(losses)) > 1


def test_shuffled_epoch_rebuilds_buffer_between_epochs(tmp_path):
    """pixel_sampler 'shuffled_epoch' re-permutes the ray buffer with a
    fresh seed once per consumed epoch (Trainer.fit); in-step it behaves
    exactly like 'shuffled'."""
    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.models.flexible_nerf import FlexibleNeRFConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config, ExperimentConfig
    from nerf_kinematics_tpu.train.trainer import Trainer

    ds = make_synthetic_scene(n_views=4, resolution=8)  # 256 train pixels
    settings = RenderSettings(num_coarse=2, num_fine=0, perturb=True,
                              pixel_sampler="shuffled_epoch")
    cfg = Config(
        model_coarse=FlexibleNeRFConfig(num_layers=2, hidden_size=8,
                                        num_encoding_fn_xyz=1,
                                        num_encoding_fn_dir=1),
        model_fine=None,
        nerf=dataclasses.replace(
            Config().nerf, train=settings,
            validation=RenderSettings(num_coarse=2, num_fine=0,
                                      perturb=False),
            num_random_rays=16,  # epoch = 256*(3/4 train? all views)/16 steps
        ),
        experiment=ExperimentConfig(id="se", logdir=str(tmp_path),
                                    train_iters=40, print_every=4,
                                    validate_every=0, save_every=0),
    )
    t = Trainer(cfg, dataset=ds)
    first = np.asarray(t.ray_buf["target"]).copy()
    builds = []
    orig = t._build_ray_buf

    def counting(seed):
        builds.append(seed)
        return orig(seed)

    t._build_ray_buf = counting
    t.fit()
    t.close()
    n_train_px = t.images.shape[0] * t.images.shape[1] * t.images.shape[2]
    epoch_steps = n_train_px // 16
    # One rebuild per epoch crossing (40 steps, chunked dispatch).
    assert len(builds) == (40 - 1) // epoch_steps >= 2, (builds, epoch_steps)
    # The rebuilt buffer is a different permutation.
    assert not np.array_equal(first, np.asarray(t.ray_buf["target"]))
    # Same multiset of pixels (a permutation, not new data).
    np.testing.assert_allclose(
        np.sort(first.ravel()),
        np.sort(np.asarray(t.ray_buf["target"]).ravel()), rtol=1e-6)
