"""Pose refinement (poses/refine.py): the differentiable XLA replica must
match the real cp_pallas model, and photometric SE(3) optimization must
recover a known pose perturbation against a trained field."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.data import make_synthetic_scene
from nerf_kinematics_tpu.models.ngp import NGPConfig, NGPModel
from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
from nerf_kinematics_tpu.poses.refine import (
    apply_delta,
    ngp_apply_diff,
    refine_pose,
    se3_exp,
)
from nerf_kinematics_tpu.rendering.renderer import RenderSettings
from nerf_kinematics_tpu.train.config import Config, NeRFConfig
from nerf_kinematics_tpu.train.ngp_engine import NGPEngine


def _tiny_cfg(use_occ=False):
    return Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp_pallas", fused="on", use_occupancy=use_occ,
            occ_resolution=16,
            cp=CPGridConfig(n_levels=2, n_components=16, base_resolution=8,
                            max_resolution=64, table_size=32,
                            use_bf16=False),
            density_width=16, density_layers=2, color_width=16,
            color_layers=2, compute_dtype="float32",
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=12, num_fine=0, perturb=True,
                                 merge_hierarchical=False),
            validation=RenderSettings(num_coarse=12, num_fine=0,
                                      perturb=False,
                                      merge_hierarchical=False),
            num_random_rays=256,
        ),
    )


def test_se3_exp_identity_and_inverse():
    np.testing.assert_allclose(np.asarray(se3_exp(jnp.zeros(6))), np.eye(4),
                               atol=1e-7)
    d = jnp.array([0.1, -0.05, 0.2, 0.3, 0.0, -0.1])
    T = np.asarray(se3_exp(d))
    Tinv = np.asarray(se3_exp(-d))
    np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-6)
    # Rotation block is orthonormal.
    np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-6)


def test_diff_replica_matches_model():
    cfg = _tiny_cfg()
    model = NGPModel(cfg.ngp)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (33, 3))
    vd = jax.random.normal(key, (33, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    params = model.init(jax.random.PRNGKey(1), x, vd)
    rgb_m, sig_m = model.apply(params, x, vd)
    rgb_d, sig_d = ngp_apply_diff(params, cfg.ngp, x, vd)
    np.testing.assert_allclose(np.asarray(rgb_d), np.asarray(rgb_m),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig_d), np.asarray(sig_m),
                               rtol=2e-4, atol=2e-5)
    # Position gradients exist and are finite (the whole point).
    g = jax.grad(lambda xx: ngp_apply_diff(params, cfg.ngp, xx, vd)[1].sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_photometric_refinement_recovers_perturbed_pose():
    """Train a tiny field, render GT at a val pose, perturb the pose, and
    recover it photometrically: pose error and loss must shrink."""
    cfg = _tiny_cfg()
    ds = make_synthetic_scene(n_views=8, resolution=24)
    engine = NGPEngine(cfg, scene_bound=1.0)
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far,
                                  ds.use_ndc, donate=False)
    state = engine.init_state(0)
    for _ in range(150):
        state, m = step(state, images, poses)

    render = engine.make_render_fn(ds.intrinsics, ds.near, ds.far,
                                   ds.use_ndc)
    pose0 = poses[0]
    gt = np.asarray(render(state.params, pose0, state.aux)["rgb"])

    d_true = jnp.array([0.03, -0.02, 0.025, 0.03, -0.02, 0.02])
    pose_bad = apply_delta(pose0, d_true)

    def img_mse(c2w):
        return float(np.mean(
            (np.asarray(render(state.params, c2w, state.aux)["rgb"]) - gt)
            ** 2))

    mse_bad = img_mse(pose_bad)
    refined, delta, losses = refine_pose(
        engine, state.params, state.aux, gt, pose_bad, ds.intrinsics,
        ds.near, ds.far, n_iters=40, n_rays=24 * 24, n_samples=12,
        lr=5e-3, white_background=False,
    )
    mse_ref = img_mse(refined)
    # Photometric error shrinks substantially toward the true pose.
    assert mse_ref < 0.5 * mse_bad, (mse_bad, mse_ref)
    # And the recovered delta opposes the injected one (pose got closer).
    err_bad = float(jnp.abs(pose_bad - pose0).max())
    err_ref = float(jnp.abs(refined - pose0).max())
    assert err_ref < err_bad, (err_bad, err_ref)
