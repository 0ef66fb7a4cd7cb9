"""Lens-distortion tests: OpenCV model inversion, ray-generation wiring,
loader plumbing, and train-to-parity on a distorted synthetic twin.

Reference semantics: the pose converter emits k1/k2/p1/p2 into
transforms.json (parser_instant_ngp.py:183-186) and instant-ngp's
nerf_loader.cu undistorts pixels during ray generation.
"""

import json

import jax.numpy as jnp
import numpy as np

from nerf_kinematics_tpu.cameras.rays import (
    distort_normalized, get_rays, undistort_normalized,
)
from nerf_kinematics_tpu.data import make_synthetic_scene

# Webcam-grade coefficients (barrel + mild tangential).
DIST = (-0.22, 0.045, 0.0012, -0.0018)


def test_undistort_inverts_forward_model():
    xs = np.linspace(-0.6, 0.6, 13)
    x, y = np.meshgrid(xs, xs)
    xd, yd = distort_normalized(jnp.asarray(x), jnp.asarray(y), *DIST)
    xu, yu = undistort_normalized(xd, yd, *DIST, iters=12)
    np.testing.assert_allclose(np.asarray(xu), x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yu), y, atol=1e-6)


def test_zero_coefficients_are_identity():
    H, W, f = 8, 8, 10.0
    o0, d0 = get_rays(H, W, f, jnp.eye(4))
    o1, d1 = get_rays(H, W, f, jnp.eye(4), dist=(0.0, 0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-7)


def test_barrel_distortion_bends_corner_rays_outward():
    """k1 < 0 (barrel): observed pixels are pulled toward the center, so the
    undistorted (true) direction of a corner pixel lies FARTHER from the
    axis than the naive pinhole direction."""
    H = W = 9
    f = 6.0  # wide FOV so corners have |x| ~ 0.75
    # Principal point pinned on pixel (4, 4) so the center ray has r = 0.
    _, d_pin = get_rays(H, W, f, jnp.eye(4), cx=4.0, cy=4.0)
    _, d_ud = get_rays(H, W, f, jnp.eye(4), cx=4.0, cy=4.0,
                       dist=(-0.2, 0.0, 0.0, 0.0))
    corner_pin = np.asarray(d_pin[0, 0])
    corner_ud = np.asarray(d_ud[0, 0])
    assert np.linalg.norm(corner_ud[:2]) > np.linalg.norm(corner_pin[:2])
    # Center ray is unaffected (r=0).
    np.testing.assert_allclose(
        np.asarray(d_ud[4, 4]), np.asarray(d_pin[4, 4]), atol=1e-7
    )


def test_transforms_loader_carries_distortion(tmp_path):
    from nerf_kinematics_tpu.data.ngp_transforms import load_transforms_json

    meta = {
        "camera_angle_x": 1.2,
        "w": 16, "h": 12,
        "fl_x": 10.0, "fl_y": 10.5,
        "k1": -0.2, "k2": 0.04, "p1": 0.001, "p2": -0.002,
        "aabb_scale": 2,
        "frames": [{"transform_matrix": np.eye(4).tolist()}],
    }
    p = tmp_path / "transforms.json"
    p.write_text(json.dumps(meta))
    _, _, intr, _ = load_transforms_json(str(p), require_images=False)
    assert intr.k1 == -0.2 and intr.k2 == 0.04
    assert intr.p1 == 0.001 and intr.p2 == -0.002
    assert intr.distortion == (-0.2, 0.04, 0.001, -0.002)
    # Scaling keeps the (normalized-coordinate) coefficients.
    assert intr.scaled(2.0).distortion == intr.distortion


def test_distorted_pixel_ray_passes_through_projected_point():
    """Full-API geometric consistency: forward-project a known 3D point
    through the OpenCV lens model onto pixel coordinates, then ask
    get_ray_batch (with ``dist``) for that pixel's ray — the ray must pass
    through the point. This is the invariant that makes a distorted capture
    multi-view-consistent, independent of any training noise."""
    from nerf_kinematics_tpu.cameras.rays import get_ray_batch

    fl_x, fl_y, cx, cy = 300.0, 310.0, 320.0, 240.0
    # Points on the z=1 plane in OpenCV camera coords (x right, y down,
    # z forward), spread to the frame edges where distortion is strong.
    pts_cv = np.array([
        [0.0, 0.0, 1.0], [0.45, -0.3, 1.0], [-0.5, 0.5, 1.0],
        [0.6, 0.1, 1.0], [-0.2, -0.55, 1.0],
    ])
    xd, yd = distort_normalized(
        jnp.asarray(pts_cv[:, 0]), jnp.asarray(pts_cv[:, 1]), *DIST
    )
    i = np.asarray(xd) * fl_x + cx  # observed (distorted) pixel columns
    j = np.asarray(yd) * fl_y + cy  # observed pixel rows
    pixels = jnp.asarray(np.stack([j, i], axis=-1))
    _, dirs = get_ray_batch(pixels, fl_x, jnp.eye(4), cx, cy,
                            focal_y=fl_y, dist=DIST)
    # OpenGL camera: the OpenCV point (x, y, z) sits at (x, -y, -z).
    pts_gl = pts_cv * np.array([1.0, -1.0, -1.0])
    d = np.asarray(dirs)
    cross = np.cross(d, pts_gl)
    assert np.abs(cross).max() < 1e-5, cross


def test_distorted_scene_trains():
    """A scene captured through a distorting lens trains (converges) when
    the coefficients are honored. Cross-variant PSNR comparisons are NOT
    asserted here: at this test scale the sphere covers so little of the
    frame that the lens shift on the subject is sub-pixel (~0.1 px), so
    warped-vs-naive PSNR deltas are statistical noise — the geometric
    correctness is pinned by the projection test above, and measured
    parity numbers on the TPU live in STATUS.md."""
    from nerf_kinematics_tpu.ops.hashgrid import HashGridConfig
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config, NeRFConfig, OptimizerConfig
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    warped = make_synthetic_scene(n_views=9, resolution=32, dist=DIST)
    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            grid=HashGridConfig(n_levels=4, n_features=2, log2_table_size=12,
                                base_resolution=4, max_resolution=64),
            density_width=32, density_layers=2,
            color_width=32, color_layers=2,
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=32, num_fine=32, perturb=True),
            validation=RenderSettings(num_coarse=32, num_fine=32,
                                      perturb=False),
            num_random_rays=512,
        ),
        optimizer=OptimizerConfig(lr=5e-3),
    )
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    step = engine.make_train_step(warped.intrinsics, warped.near, warped.far,
                                  False, donate=False)
    images, poses = jnp.asarray(warped.images), jnp.asarray(warped.poses)
    losses = []
    for _ in range(120):
        state, m = step(state, images, poses)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
