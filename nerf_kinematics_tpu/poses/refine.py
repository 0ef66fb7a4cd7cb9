"""Photometric SE(3) pose refinement against a trained NGP field.

The SfM poses (poses/sfm.py) are good to ~1 px reprojection, but NeRF
quality at 1080p is registration-limited well below that: a trained field
sharpens measurably when each camera is nudged to maximize photometric
agreement (BARF/iNGP pose-refinement practice; VERDICT r3 #7).

The training path's kernels stop-gradient point positions (by design —
positions are data there), so refinement runs a small differentiable XLA
replica of the model: ``cp_encode_stacked(point_grads=True)`` (exactly the
Pallas kernel's function, ops/cp_grid.py) + the MLP chain applied from the
same parameter tree. Gradients flow loss → rgb → points → rays → SE(3)
delta. Sample depths come from the engine's occupancy proposal and are
stop-gradiented (the derivative through sample PLACEMENT is noise; the
derivative through sample POSITION is the signal).

``refine_pose`` optimizes one camera (6 params) — used for val-pose
photometric alignment, which never touches training data. ``refine_poses``
jointly refines every train pose against its own pixels with the model
FROZEN (cheap, stable; run it after training, then fine-tune the model a
few hundred steps if desired).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..cameras.rays import pixel_dirs
from ..ops.cp_grid import cp_encode_stacked
from ..ops.sh import sh_encode
from ..ops.volume_render import raw2outputs


def se3_exp(delta: jnp.ndarray) -> jnp.ndarray:
    """(6,) [ω | v] → (4, 4) SE(3) exponential (Rodrigues + exact V).

    Differentiable AT ω = 0 (the optimizer's starting point): the angle is
    sqrt(‖ω‖² + ε) — d‖ω‖/dω at zero is 0/0 — and the sinc-like
    coefficients switch to their Taylor forms for small angles (both
    branches of jnp.where are evaluated under grad, so each must be finite
    everywhere)."""
    w, v = delta[:3], delta[3:]
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-16)
    small = th < 1e-4
    K = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / (th2 + 1e-16))
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (1.0 - jnp.sin(th) / th) / (th2 + 1e-16))
    R = jnp.eye(3) + A * K + B * (K @ K)
    V = jnp.eye(3) + B * K + C * (K @ K)
    top = jnp.concatenate([R, (V @ v)[:, None]], axis=1)
    return jnp.concatenate([top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)


def apply_delta(c2w: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Left-apply a world-frame SE(3) perturbation to a camera-to-world."""
    return se3_exp(delta) @ c2w


def _mlp(params, names, h, act_last=False):
    for i, n in enumerate(names):
        h = h @ params[n]["kernel"] + params[n]["bias"]
        if i < len(names) - 1 or act_last:
            h = jax.nn.relu(h)
    return h


def ngp_apply_diff(params, ngp_cfg, xyz_unit, viewdirs):
    """Differentiable-by-position replica of NGPModel.__call__ for
    cp_pallas-format params: (..., 3) unit-cube points → (rgb logits, σ).
    Matches models/ngp.py's chain (same layer names, f32 σ path)."""
    p = params["params"]
    enc = cp_encode_stacked(p["cp_lines"], xyz_unit, ngp_cfg.cp,
                            point_grads=True)
    d_names = [f"density_{i}" for i in range(ngp_cfg.density_layers - 1)]
    d_names.append("density_out")
    feat = _mlp(p, d_names, enc)
    sigma = jnp.exp(jnp.clip(feat[..., 0].astype(jnp.float32), -15.0, 15.0))
    sh = sh_encode(viewdirs, ngp_cfg.sh_degree)
    c_names = [f"color_{i}" for i in range(ngp_cfg.color_layers - 1)]
    c_names.append("color_out")
    rgb = _mlp(p, c_names, jnp.concatenate([feat, sh], axis=-1))
    return rgb.astype(jnp.float32), sigma


def make_photometric_loss(engine, params, aux, image, intrinsics, near, far,
                          n_samples: int = 64, n_rays: int = 4096,
                          white_background: bool = True):
    """(delta (6,), base c2w (4,4), key) → photometric MSE on a random pixel
    batch, differentiable w.r.t. ``delta``. The model is FROZEN
    (stop-gradiented params); sample depths come from the engine's
    occupancy proposal under stop_gradient."""
    H, W = intrinsics.height, intrinsics.width
    fl_x, fl_y = intrinsics.fl_x, intrinsics.fl_y
    cx, cy = intrinsics.cx, intrinsics.cy
    dist = getattr(intrinsics, "distortion", None)
    cfg = engine.ngp_config
    frozen = jax.lax.stop_gradient(params["coarse"])
    image = jnp.asarray(image)

    from ..rendering.renderer import RenderSettings

    prop_settings = RenderSettings(num_coarse=n_samples, perturb=False)
    proposal = engine.proposal_for(aux, near, far, prop_settings)

    def loss_fn(delta, c2w0, key):
        k_px, k_prop = jax.random.split(key)
        px = jax.random.randint(k_px, (n_rays,), 0, H * W)
        row = (px // W).astype(jnp.float32)
        col = (px % W).astype(jnp.float32)
        target = image.reshape(H * W, -1)[px, :3]

        c2w = apply_delta(c2w0, delta)
        dirs_cam = pixel_dirs(col, row, fl_x, fl_y, cx, cy, dist=dist)
        rays_d = dirs_cam @ c2w[:3, :3].T
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        if proposal is not None:
            z = proposal(k_prop, jax.lax.stop_gradient(rays_o),
                         jax.lax.stop_gradient(rays_d))
        else:
            t = jnp.linspace(0.0, 1.0, n_samples)
            z = jnp.broadcast_to(near + (far - near) * t,
                                 (n_rays, n_samples))
        z = jax.lax.stop_gradient(z)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        vd = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
        rgb_raw, sigma = ngp_apply_diff(frozen, cfg, engine._to_unit(pts), vd)
        out = raw2outputs(rgb_raw, sigma, z, rays_d,
                          white_background=white_background)
        return jnp.mean((out.rgb - target) ** 2)

    return loss_fn


def refine_pose(engine, params, aux, image, c2w0, intrinsics, near, far,
                n_iters: int = 60, n_rays: int = 4096, n_samples: int = 64,
                lr: float = 3e-4, seed: int = 0,
                white_background: bool = True, delta0=None):
    """Optimize one camera's SE(3) delta photometrically. Returns
    (refined c2w (4,4), delta (6,), per-iter losses)."""
    loss_fn = make_photometric_loss(
        engine, params, aux, image, intrinsics, near, far,
        n_samples=n_samples, n_rays=n_rays,
        white_background=white_background,
    )
    c2w0 = jnp.asarray(c2w0)
    delta = jnp.zeros((6,)) if delta0 is None else jnp.asarray(delta0)
    tx = optax.adam(lr)
    opt = tx.init(delta)

    @jax.jit
    def step(delta, opt, key):
        loss, g = jax.value_and_grad(loss_fn)(delta, c2w0, key)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(delta, upd), opt, loss

    key = jax.random.PRNGKey(seed)
    losses = []
    for _ in range(n_iters):
        key, sub = jax.random.split(key)
        delta, opt, loss = step(delta, opt, sub)
        losses.append(float(loss))
    return apply_delta(c2w0, delta), delta, losses


def refine_poses(engine, params, aux, images, c2ws, intrinsics, near, far,
                 n_iters: int = 200, n_rays: int = 2048,
                 n_samples: int = 64, lr: float = 3e-4, seed: int = 0,
                 white_background: bool = True):
    """Jointly refine every train pose against a frozen model: one (N, 6)
    delta tensor, each iteration drawing its pixel batch from ONE image per
    pose slot round-robin... in practice a random image per iteration with
    that image's delta updated (sparse Adam via masking is overkill at N≤
    a few hundred poses — a dense update with per-image loss works).
    Returns (refined c2ws (N,4,4), deltas (N,6))."""
    import numpy as np

    images = jnp.asarray(images)
    c2ws = jnp.asarray(c2ws)
    n = c2ws.shape[0]
    H, W = intrinsics.height, intrinsics.width
    fl_x, fl_y = intrinsics.fl_x, intrinsics.fl_y
    cx, cy = intrinsics.cx, intrinsics.cy
    dist = getattr(intrinsics, "distortion", None)
    cfg = engine.ngp_config
    frozen = jax.lax.stop_gradient(params["coarse"])

    from ..rendering.renderer import RenderSettings

    prop_settings = RenderSettings(num_coarse=n_samples, perturb=False)
    proposal = engine.proposal_for(aux, near, far, prop_settings)

    # images/c2ws/frozen params are threaded through the jit as ARGUMENTS:
    # closed-over device arrays lower as HLO constants, and at fox scale the
    # (N, 1080, 1920, 3) stack is ~1.2 GB of literal — the remote-compile
    # payload breaks the device tunnel (observed twice: Broken pipe from
    # /remote_compile at first dispatch). As inputs they are plain buffers.
    def loss_fn(deltas, imgs, poses, fparams, key):
        k_img, k_px, k_prop = jax.random.split(key, 3)
        i = jax.random.randint(k_img, (), 0, n)
        px = jax.random.randint(k_px, (n_rays,), 0, H * W)
        row = (px // W).astype(jnp.float32)
        col = (px % W).astype(jnp.float32)
        target = imgs[i].reshape(H * W, -1)[px, :3]
        c2w = apply_delta(poses[i], deltas[i])
        dirs_cam = pixel_dirs(col, row, fl_x, fl_y, cx, cy, dist=dist)
        rays_d = dirs_cam @ c2w[:3, :3].T
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        if proposal is not None:
            z = proposal(k_prop, jax.lax.stop_gradient(rays_o),
                         jax.lax.stop_gradient(rays_d))
        else:
            t = jnp.linspace(0.0, 1.0, n_samples)
            z = jnp.broadcast_to(near + (far - near) * t, (n_rays, n_samples))
        z = jax.lax.stop_gradient(z)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        vd = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
        rgb_raw, sigma = ngp_apply_diff(fparams, cfg, engine._to_unit(pts), vd)
        out = raw2outputs(rgb_raw, sigma, z, rays_d,
                          white_background=white_background)
        return jnp.mean((out.rgb - target) ** 2)

    deltas = jnp.zeros((n, 6))
    tx = optax.adam(lr)
    opt = tx.init(deltas)

    @jax.jit
    def step(deltas, opt, imgs, poses, fparams, key):
        loss, g = jax.value_and_grad(loss_fn)(deltas, imgs, poses, fparams,
                                              key)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(deltas, upd), opt, loss

    key = jax.random.PRNGKey(seed)
    for _ in range(n_iters):
        key, sub = jax.random.split(key)
        deltas, opt, _ = step(deltas, opt, images, c2ws, frozen, sub)
    refined = jnp.stack([apply_delta(c2ws[i], deltas[i]) for i in range(n)])
    return refined, deltas
