"""Ray generation from camera intrinsics and camera-to-world poses.

TPU-native equivalent of the classic-NeRF ``get_rays`` + NDC warp
(reference: nerf-pytorch submodule, evidenced by BASELINE.json north-star and
``no_ndc`` config flags in trained_models/nerf-pytorch/*/config.yml). All
functions are pure, statically-shaped, and jit/vmap-friendly: full-image ray
grids are computed as one broadcasted expression (no Python pixel loops), so
XLA fuses them into downstream sampling.

Convention: OpenGL/NeRF camera — x right, y up, camera looks along -z. A pixel
(i, j) (column i, row j) maps to direction
``[(i - cx)/fl_x, -(j - cy)/fl_y, -1]`` in camera space.
"""

from __future__ import annotations

import jax.numpy as jnp


def distort_normalized(x, y, k1, k2, p1, p2):
    """Forward OpenCV lens model on normalized camera coords (x right,
    y DOWN — OpenCV convention): undistorted → distorted.

    Reference semantics: instant-ngp ``src/nerf_loader.cu`` applies this
    model's inverse per pixel when transforms.json carries k1/k2/p1/p2
    (which the pose converter emits, parser_instant_ngp.py:183-186).
    """
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * k2)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def undistort_normalized(xd, yd, k1, k2, p1, p2, iters: int = 8):
    """Invert the OpenCV model by fixed-point iteration (the standard
    cv2.undistortPoints scheme): x ← (xd − tangential(x)) / radial(x).

    ``iters`` is a static Python int, so the loop unrolls at trace time —
    branch-free, statically shaped, fuses into the surrounding ray setup.
    8 iterations recovers typical webcam-grade distortion to < 1e-7.
    """
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * k2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return x, y


def pixel_dirs(i, j, fl_x, fl_y, cx, cy, dist=None):
    """Camera-space direction(s) for pixel coords (column ``i``, row ``j``),
    OpenGL convention. When ``dist`` = (k1, k2, p1, p2) is given, the pixel
    grid is treated as distorted observations and iteratively undistorted
    (OpenCV coords are y-down, so the y flip happens AFTER undistortion).
    """
    x = (i - cx) / fl_x
    y = (j - cy) / fl_y  # y-down (OpenCV) at this point
    if dist is not None:
        x, y = undistort_normalized(x, y, *dist)
    return jnp.stack(
        jnp.broadcast_arrays(x, -y, -jnp.ones_like(x + y)), axis=-1
    )


def get_rays(H: int, W: int, focal, c2w, cx=None, cy=None, focal_y=None,
             dist=None):
    """Per-pixel ray origins and directions for a full image.

    Args:
      H, W: image size (static Python ints).
      focal: focal length in pixels (fl_x).
      c2w: (4, 4) or (3, 4) camera-to-world matrix.
      cx, cy: principal point; defaults to image center (W/2, H/2).
      focal_y: vertical focal length; defaults to ``focal``.
      dist: optional (k1, k2, p1, p2) OpenCV distortion — pixel coords are
        undistorted before being lifted to directions.

    Returns:
      rays_o, rays_d: each (H, W, 3). Directions are *not* normalized
      (classic-NeRF semantics: z-depth parameterization along -z).
    """
    c2w = jnp.asarray(c2w)
    cx = W * 0.5 if cx is None else cx
    cy = H * 0.5 if cy is None else cy
    fy = focal if focal_y is None else focal_y

    i = jnp.arange(W, dtype=jnp.float32)[None, :]  # (1, W) columns
    j = jnp.arange(H, dtype=jnp.float32)[:, None]  # (H, 1) rows
    dirs = pixel_dirs(
        jnp.broadcast_to(i, (H, W)), jnp.broadcast_to(j, (H, W)),
        focal, fy, cx, cy, dist=dist,
    )
    # Rotate camera-space dirs into world space: dirs @ R^T.
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_ray_batch(pixels_ij, focal, c2w, cx, cy, focal_y=None, dist=None):
    """Rays for a (N, 2) batch of (row j, col i) pixel coordinates — used by
    the random-ray training sampler. Returns (N, 3) origins and directions."""
    pixels_ij = jnp.asarray(pixels_ij, dtype=jnp.float32)
    fy = focal if focal_y is None else focal_y
    j, i = pixels_ij[:, 0], pixels_ij[:, 1]
    dirs = pixel_dirs(i, j, focal, fy, cx, cy, dist=dist)
    rays_d = dirs @ jnp.asarray(c2w)[:3, :3].T
    rays_o = jnp.broadcast_to(jnp.asarray(c2w)[:3, 3], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal, near, rays_o, rays_d):
    """Warp rays into NDC space for forward-facing (LLFF) scenes.

    Standard NeRF NDC derivation: shift origins to the near plane, then apply
    the perspective projection so the frustum maps to the [-1, 1] cube and
    t ∈ [0, 1] spans near→infinity.
    """
    # Shift ray origins to near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = (
        -1.0
        / (W / (2.0 * focal))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0
        / (H / (2.0 * focal))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
