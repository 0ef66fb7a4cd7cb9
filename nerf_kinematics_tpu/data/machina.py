"""Lego-class synthetic benchmark scene ("machina"): a multi-part textured
rig with fine geometry, rendered analytically to a blender-format dataset.

The reference's headline quality numbers are on nerf_synthetic/lego
(README.md:71: >25 dB; trained_models/nerf-pytorch/lego-lowres3: 21.02 dB
@110k half-res), but the lego assets are not shipped in the environment.
This module provides a workload of the same class so those targets are
demonstrable end-to-end: ~100 views at 400x400+ of a textured multi-part
object (stud grid, gear-toothed wheels, angled arms, a thin shell scoop)
with alpha for white-background compositing, written to disk as
``transforms_{train,val,test}.json`` + RGBA PNGs — the exact format the
blender loader (and the reference's own loader) consumes.

Ground truth is a closed-form density/color field volume-rendered with the
SAME compositing math the framework trains against, so a correct NeRF must
reach high PSNR; the geometry is SDF-composed and the textures are
high-frequency procedurals, so *easy* scenes don't sneak through.

All evaluation is jnp and runs chunked on the accelerator: a 400x400x100-view
dataset renders in seconds-to-minutes, not hours.
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras.rays import get_rays
from ..poses.orbit import _look_at_poses

# Matches nerf_synthetic/lego's horizontal FOV (transforms_train.json).
CAMERA_ANGLE_X = 0.6911112070083618
RADIUS = 4.0311289
NEAR, FAR = 2.0, 6.0

_SIGMA_MAX = 400.0
_SOFT = 0.005  # SDF→density softness; ~edge width 0.02 ≈ 3px at 400res


# ---------------------------------------------------------------------------
# SDF primitives (jnp, broadcast over (..., 3) points)
# ---------------------------------------------------------------------------
def _box(p, half):
    q = jnp.abs(p) - half
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def _rot_y(p, angle):
    c, s = np.cos(angle), np.sin(angle)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack([c * x + s * z, y, -s * x + c * z], axis=-1)


def machina_field(pts):
    """Ground-truth field. pts (..., 3) → (rgb (..., 3) in [0,1], sigma ≥ 0)."""
    p = jnp.asarray(pts, jnp.float32)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    sdfs, cols = [], []

    # -- base plate: checkered box -------------------------------------
    d_plate = _box(p - jnp.array([0.0, 0.0, -0.42]), jnp.array([0.95, 0.62, 0.05]))
    checker = jnp.mod(jnp.floor(x * 5.0) + jnp.floor(y * 5.0), 2.0)
    col_plate = (
        checker[..., None] * jnp.array([0.13, 0.35, 0.16])
        + (1 - checker)[..., None] * jnp.array([0.25, 0.55, 0.28])
    )
    sdfs.append(d_plate)
    cols.append(col_plate)

    # -- stud grid on the plate top (repeat-mod cylinders; fine geometry)
    lx = jnp.mod(x + 0.9 + 0.1, 0.2) - 0.1     # x pitch 0.2 over [-0.9, 0.9]
    ly = jnp.mod(y + 0.5 + 0.125, 0.25) - 0.125  # y pitch 0.25 over [-0.5, 0.5]
    r_stud = jnp.sqrt(lx**2 + ly**2)
    d_stud = jnp.maximum(r_stud - 0.055, jnp.abs(z + 0.345) - 0.028)
    in_plate = (jnp.abs(x) < 0.86) & (jnp.abs(y) < 0.56)
    d_stud = jnp.where(in_plate, d_stud, 1e3)
    col_stud = jnp.broadcast_to(jnp.array([0.32, 0.68, 0.30]), p.shape)
    sdfs.append(d_stud)
    cols.append(col_stud)

    # -- cabin: yellow box with carved window --------------------------
    d_cab = _box(p - jnp.array([-0.55, 0.0, -0.10]), jnp.array([0.26, 0.30, 0.27]))
    d_win = _box(p - jnp.array([-0.45, 0.0, 0.02]), jnp.array([0.24, 0.22, 0.12]))
    d_cabin = jnp.maximum(d_cab, -d_win)
    band = 0.5 + 0.5 * jnp.sin(24.0 * z)
    col_cabin = (
        band[..., None] * jnp.array([0.92, 0.76, 0.12])
        + (1 - band)[..., None] * jnp.array([0.70, 0.54, 0.05])
    )
    sdfs.append(d_cabin)
    cols.append(col_cabin)

    # -- two angled arm segments with diagonal hazard stripes ----------
    qa = _rot_y(p - jnp.array([0.05, 0.0, 0.28]), -0.6)
    d_arm_a = _box(qa, jnp.array([0.42, 0.075, 0.055]))
    qb = _rot_y(p - jnp.array([0.60, 0.0, 0.34]), 0.8)
    d_arm_b = _box(qb, jnp.array([0.33, 0.065, 0.05]))
    stripe = 0.5 + 0.5 * jnp.sin(28.0 * (x + z))
    col_arm = (
        stripe[..., None] * jnp.array([0.90, 0.45, 0.08])
        + (1 - stripe)[..., None] * jnp.array([0.15, 0.12, 0.10])
    )
    sdfs.extend([d_arm_a, d_arm_b])
    cols.extend([col_arm, col_arm])

    # -- scoop: thin spherical shell cut by a plane --------------------
    pc = p - jnp.array([0.88, 0.0, 0.02])
    shell = jnp.abs(jnp.linalg.norm(pc, axis=-1) - 0.20) - 0.025
    d_scoop = jnp.maximum(shell, pc[..., 2] - 0.06)
    glint = 0.5 + 0.25 * jnp.sin(40.0 * pc[..., 0]) * jnp.sin(40.0 * pc[..., 1])
    col_scoop = glint[..., None] * jnp.array([0.62, 0.63, 0.68])
    sdfs.append(d_scoop)
    cols.append(col_scoop)

    # -- four gear-toothed wheels (mirror trick: one eval → 4 wheels) --
    wx = jnp.abs(x) - 0.55
    wy = jnp.abs(y) - 0.68
    wz = z + 0.33
    ang = jnp.arctan2(wz, wx)
    r_eff = 0.17 + 0.018 * jnp.sin(9.0 * ang)
    d_wheel = jnp.maximum(jnp.sqrt(wx**2 + wz**2) - r_eff, jnp.abs(wy) - 0.07)
    spoke = 0.5 + 0.5 * jnp.sin(5.0 * ang)
    col_wheel = (
        spoke[..., None] * jnp.array([0.10, 0.10, 0.12])
        + (1 - spoke)[..., None] * jnp.array([0.45, 0.42, 0.40])
    )
    sdfs.append(d_wheel)
    cols.append(col_wheel)

    # -- exhaust stack --------------------------------------------------
    d_exh = jnp.maximum(
        jnp.sqrt((x + 0.72) ** 2 + (y - 0.22) ** 2) - 0.05,
        jnp.abs(z - 0.28) - 0.14,
    )
    col_exh = jnp.broadcast_to(jnp.array([0.80, 0.16, 0.12]), p.shape)
    sdfs.append(d_exh)
    cols.append(col_exh)

    sdf_all = jnp.stack(sdfs, axis=-1)          # (..., P)
    col_all = jnp.stack(cols, axis=-2)          # (..., P, 3)
    part = jnp.argmin(sdf_all, axis=-1)
    sdf = jnp.min(sdf_all, axis=-1)
    rgb = jnp.take_along_axis(col_all, part[..., None, None], axis=-2)[..., 0, :]
    sigma = _SIGMA_MAX / (1.0 + jnp.exp(sdf / _SOFT))
    return jnp.clip(rgb, 0.0, 1.0), sigma


# ---------------------------------------------------------------------------
# Analytic volume renderer (chunked, on-device)
# ---------------------------------------------------------------------------
def _render_ray_chunk(rays, n_samples):
    rays_o, rays_d = rays[..., 0:3], rays[..., 3:6]
    t = jnp.linspace(NEAR, FAR, n_samples, dtype=jnp.float32)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
    rgb, sigma = machina_field(pts)
    delta = (FAR - NEAR) / (n_samples - 1)
    dists = delta * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    w = alpha * trans
    comp = (w[..., None] * rgb).sum(axis=-2)
    acc = w.sum(axis=-1)
    return comp, acc


@functools.partial(jax.jit, static_argnums=(1, 2, 4))
def render_view(c2w, H: int, W: int, focal, n_samples: int = 1024):
    """Render one ground-truth view: returns (rgb composited on black (H,W,3),
    alpha (H,W)) — both float32 on device."""
    rays_o, rays_d = get_rays(H, W, focal, jnp.asarray(c2w, jnp.float32))
    rays = jnp.concatenate([rays_o, rays_d], axis=-1).reshape(-1, 6)
    n = rays.shape[0]
    chunk = 4096
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 6), rays.dtype)])
    rays = rays.reshape(n_chunks, chunk, 6)
    comp, acc = jax.lax.map(
        functools.partial(_render_ray_chunk, n_samples=n_samples), rays
    )
    comp = comp.reshape(-1, 3)[:n].reshape(H, W, 3)
    acc = acc.reshape(-1)[:n].reshape(H, W)
    return comp, acc


# ---------------------------------------------------------------------------
# Pose synthesis (lego-like: random upper hemisphere train, orbit test)
# ---------------------------------------------------------------------------
def hemisphere_poses(n: int, seed: int = 0, radius: float = RADIUS,
                     elev_range=(3.0, 62.0)) -> np.ndarray:
    """n c2w poses on the upper hemisphere at fixed radius, looking at the
    origin — the nerf_synthetic train-view distribution."""
    rng = np.random.default_rng(seed)
    azim = rng.uniform(0.0, 2 * np.pi, n)
    elev = np.radians(rng.uniform(*elev_range, n))
    pos = np.stack(
        [
            radius * np.cos(elev) * np.cos(azim),
            radius * np.cos(elev) * np.sin(azim),
            radius * np.sin(elev),
        ],
        axis=1,
    )
    return _look_at_poses(pos, np.zeros(3)).astype(np.float32)


def orbit_poses(n: int, elev_deg: float = 30.0, radius: float = RADIUS) -> np.ndarray:
    theta = 2 * np.pi * np.arange(n) / n
    e = np.radians(elev_deg)
    pos = np.stack(
        [
            radius * np.cos(e) * np.cos(theta),
            radius * np.cos(e) * np.sin(theta),
            np.full(n, radius * np.sin(e)),
        ],
        axis=1,
    )
    return _look_at_poses(pos, np.zeros(3)).astype(np.float32)


# ---------------------------------------------------------------------------
# Dataset writer (blender format on disk)
# ---------------------------------------------------------------------------
def write_machina_dataset(
    outdir: str,
    resolution: int = 400,
    n_train: int = 100,
    n_val: int = 8,
    n_test: int = 16,
    seed: int = 7,
    n_samples: int = 1024,
    force: bool = False,
) -> str:
    """Render + write the dataset as transforms_{train,val,test}.json + RGBA
    PNGs. Idempotent: skips rendering if a matching marker file exists.
    Returns ``outdir``."""
    from PIL import Image

    marker = os.path.join(outdir, ".machina.json")
    params = {
        "resolution": resolution, "n_train": n_train, "n_val": n_val,
        "n_test": n_test, "seed": seed, "n_samples": n_samples, "version": 1,
    }
    if not force and os.path.isfile(marker):
        try:
            with open(marker) as f:
                if json.load(f) == params:
                    return outdir
        except Exception:
            pass

    H = W = resolution
    focal = 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)
    splits = {
        "train": hemisphere_poses(n_train, seed=seed),
        "val": hemisphere_poses(n_val, seed=seed + 1),
        "test": orbit_poses(n_test),
    }
    for split, poses in splits.items():
        d = os.path.join(outdir, split)
        os.makedirs(d, exist_ok=True)
        frames = []
        for k, c2w in enumerate(poses):
            comp, acc = render_view(c2w, H, W, focal, n_samples)
            comp, acc = np.asarray(comp), np.asarray(acc)
            # Un-premultiply so loader-side `rgb*a + bg*(1-a)` reproduces
            # the analytic composite (8-bit quantization aside).
            rgb = np.clip(comp / np.maximum(acc[..., None], 1e-6), 0.0, 1.0)
            rgba = np.concatenate([rgb, np.clip(acc, 0, 1)[..., None]], axis=-1)
            Image.fromarray((rgba * 255).round().astype(np.uint8), "RGBA").save(
                os.path.join(d, f"r_{k}.png")
            )
            frames.append(
                {
                    "file_path": f"./{split}/r_{k}",
                    "transform_matrix": c2w.tolist(),
                }
            )
        meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
        with open(os.path.join(outdir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    with open(marker, "w") as f:
        json.dump(params, f)
    return outdir
