"""Procedural synthetic scene with an analytically known radiance field.

Stands in for nerf_synthetic/lego in self-contained tests and benchmarks (the
reference's blender assets are not shipped): a soft-edged colored sphere whose
density and color are closed-form, rendered through the *same* compositing
math the framework trains against (ops.volume_render), from orbit cameras.
Any correct NeRF implementation must fit it to high PSNR in a few hundred
iterations at low resolution — the convergence smoke test of SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np

from ..cameras.rays import get_rays
from ..poses.orbit import generate_orbit_poses
from .types import Intrinsics, NerfDataset


def field_fn(pts: np.ndarray):
    """Ground-truth field: density = smooth sphere (r=0.5) at origin,
    color = position-dependent RGB. Returns (rgb in [0,1], sigma >= 0)."""
    r = np.linalg.norm(pts, axis=-1)
    sigma = 40.0 / (1.0 + np.exp((r - 0.5) * 30.0))
    rgb = np.clip(0.5 + pts, 0.05, 0.95)
    return rgb, sigma


# Fixed blob layout for the "blobs" variant (deterministic, no RNG at trace).
_BLOBS = np.array(
    [  # x, y, z, radius
        [0.00, 0.00, 0.00, 0.30],
        [0.55, 0.10, 0.15, 0.18],
        [-0.45, 0.35, -0.20, 0.15],
        [0.15, -0.55, 0.25, 0.12],
        [-0.25, -0.30, -0.45, 0.20],
        [0.35, 0.45, -0.35, 0.10],
    ]
)
_BLOB_COLORS = np.array(
    [
        [0.9, 0.2, 0.2], [0.2, 0.8, 0.3], [0.2, 0.3, 0.9],
        [0.9, 0.8, 0.1], [0.8, 0.2, 0.8], [0.1, 0.8, 0.8],
    ]
)


def field_fn_blobs(pts: np.ndarray):
    """Harder ground truth: six colored blobs with high-frequency striping —
    stresses multi-level capacity and fold-collision disambiguation."""
    flat = pts.reshape(-1, 3)
    d = np.linalg.norm(flat[:, None, :] - _BLOBS[None, :, :3], axis=-1)
    act = 1.0 / (1.0 + np.exp((d - _BLOBS[None, :, 3]) * 40.0))  # (N, B)
    sigma = 60.0 * act.max(axis=1)
    w = act / (act.sum(axis=1, keepdims=True) + 1e-9)
    base = w @ _BLOB_COLORS
    stripes = 0.25 * np.sin(14.0 * flat[:, 0:1] + 9.0 * flat[:, 2:3])
    rgb = np.clip(base + stripes, 0.02, 0.98)
    return rgb.reshape(*pts.shape[:-1], 3), sigma.reshape(pts.shape[:-1])


_HALO_SATS = np.array(
    [  # x, y, z, radius — satellites far from the origin (the fox regime:
       # central subject + background content spread over a large AABB).
        [6.0, 0.0, 1.0, 1.2],
        [-5.0, 4.0, -1.0, 1.0],
        [0.0, -6.5, 2.0, 1.4],
        [-3.5, -4.5, -2.0, 0.9],
    ]
)
_HALO_COLORS = np.array(
    [[0.9, 0.3, 0.2], [0.2, 0.8, 0.4], [0.25, 0.35, 0.9], [0.9, 0.8, 0.2]]
)


def field_fn_halo(pts: np.ndarray):
    """Large-scene ground truth: the detailed unit sphere of ``field_fn`` at
    the origin plus big diffuse satellites out to radius ~7 — content spans
    an aabb_scale-16-class volume while the subject stays unit-scale,
    exactly the regime where a single linear grid collapses and
    cascades/contraction are required."""
    flat = pts.reshape(-1, 3)
    rgb_c, sigma_c = field_fn(flat)
    d = np.linalg.norm(flat[:, None, :] - _HALO_SATS[None, :, :3], axis=-1)
    act = 1.0 / (1.0 + np.exp((d - _HALO_SATS[None, :, 3]) * 10.0))  # (N, S)
    sigma_s = 30.0 * act.max(axis=1)
    w = act / (act.sum(axis=1, keepdims=True) + 1e-9)
    rgb_s = w @ _HALO_COLORS
    central = sigma_c >= sigma_s
    sigma = np.where(central, sigma_c, sigma_s)
    rgb = np.where(central[:, None], rgb_c, rgb_s)
    return (
        np.clip(rgb, 0.02, 0.98).reshape(*pts.shape[:-1], 3),
        sigma.reshape(pts.shape[:-1]),
    )


def _render_gt(pose, H, W, focal, near, far, n_samples=192, field=field_fn,
               dist=None):
    """Analytic volume render of a ground-truth field along pinhole rays.
    ``dist`` = (k1, k2, p1, p2) simulates capture through a distorting lens:
    pixel (i, j) observes along the ray of its *undistorted* coordinates,
    exactly the geometry a distortion-aware loader must reproduce."""
    rays_o, rays_d = get_rays(H, W, focal, pose.astype(np.float32), dist=dist)
    rays_o, rays_d = np.asarray(rays_o), np.asarray(rays_d)
    t = np.linspace(near, far, n_samples, dtype=np.float32)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
    rgb, sigma = field(pts)

    dists = np.diff(t)
    dists = np.append(dists, 1e10).astype(np.float32)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = np.concatenate([np.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans
    img = (weights[..., None] * rgb).sum(axis=-2)
    return img.astype(np.float32)


def make_synthetic_scene(
    cfg=None,
    n_views: int = 12,
    resolution: int = 64,
    radius: float = 2.0,
    near: float = 0.5,
    far: float = 3.5,
    seed: int = 0,
    variant: str = "sphere",
    dist=None,
) -> NerfDataset:
    """Build the synthetic dataset; ``cfg`` may override via attributes.
    ``variant``: "sphere" (easy), "blobs" (multi-object, high-frequency) or
    "halo" (unit-scale subject + far satellites: the large-AABB fox regime —
    radius/near/far/aabb default to camera orbits at r=11 over a bound-16
    scene).
    ``dist``: optional (k1, k2, p1, p2) — images are captured through a
    distorting lens and the intrinsics carry the coefficients."""
    aabb_scale = 1.0
    if variant == "halo":
        radius, near, far, aabb_scale = 11.0, 2.5, 20.0, 32.0
    if cfg is not None:
        near = float(getattr(cfg, "near", near))
        far = float(getattr(cfg, "far", far))
    field = {"sphere": field_fn, "blobs": field_fn_blobs,
             "halo": field_fn_halo}[variant]

    H = W = resolution
    focal = 0.9 * resolution

    # Orbit in XY plane plus elevated rings for vertical parallax.
    rng = np.random.default_rng(seed)
    poses = []
    per_ring = max(-(-n_views // 3), 2)
    for z, r in ((0.0, radius), (0.9, radius * 0.85), (-0.9, radius * 0.85)):
        ring = generate_orbit_poses(np.zeros(3), r, per_ring)
        ring[:, 2, 3] += z
        # Re-aim at origin by rebuilding the look-at with the shifted position.
        from ..poses.orbit import _look_at_poses

        ring = _look_at_poses(ring[:, :3, 3], np.zeros(3))
        poses.append(ring)
    poses = np.concatenate(poses)[:n_views].astype(np.float32)

    images = np.stack(
        [_render_gt(p, H, W, focal, near, far, field=field, dist=dist)
         for p in poses]
    )

    k1, k2, p1, p2 = dist if dist is not None else (0.0, 0.0, 0.0, 0.0)
    idx = np.arange(n_views)
    return NerfDataset(
        images=images,
        poses=poses,
        intrinsics=Intrinsics(focal, focal, W / 2.0, H / 2.0, W, H,
                              k1=k1, k2=k2, p1=p1, p2=p2),
        near=near,
        far=far,
        train_idx=idx[:-2],
        val_idx=idx[-2:],
        use_ndc=False,
        aabb_scale=aabb_scale,
    )
