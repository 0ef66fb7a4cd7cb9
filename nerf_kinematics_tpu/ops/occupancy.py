"""Occupancy grid: density-aware sample placement with static shapes.

TPU-native equivalent of instant-ngp's occupancy-bitfield ray marching
(src/testbed_nerf.cu): the reference skips empty space with data-dependent
early exit — dynamic shapes XLA can't compile. Here the occupancy grid
instead *importance-weights* a fixed sample budget (SURVEY.md §7 "hard
parts"): a periodic full-grid density query maintains an EMA occupancy
volume; at render time each ray's stratified bins are reweighted by the
trilinear-interpolated occupancy and resampled through the inverse CDF, so
samples concentrate in occupied space while every shape stays static.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .sampling import sample_pdf


class OccupancyGrid(NamedTuple):
    density: jnp.ndarray  # (R, R, R) EMA of queried densities
    bound: jnp.ndarray  # scalar: grid spans [-bound, bound]^3

    @property
    def resolution(self) -> int:
        return self.density.shape[0]


def init_grid(resolution: int = 128, bound: float = 1.0) -> OccupancyGrid:
    """Optimistic init (all-occupied) so early training sees everything."""
    return OccupancyGrid(
        density=jnp.ones((resolution,) * 3, jnp.float32),
        bound=jnp.float32(bound),
    )


def update_grid(
    grid: OccupancyGrid,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    decay: float = 0.95,
    chunk: int = 65536,
) -> OccupancyGrid:
    """EMA update: query density at one jittered point per cell and take
    max(decay * old, new) — the NGP update rule, evaluated for ALL cells
    (a periodic full sweep instead of incremental scatter updates, which
    XLA would serialize)."""
    R = grid.resolution
    b = grid.bound
    lin = (jnp.arange(R) + 0.5) / R  # cell centers in [0, 1]
    zs, ys, xs = jnp.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.stack([xs, ys, zs], -1).reshape(-1, 3)
    jitter = (jax.random.uniform(key, pts.shape) - 0.5) / R
    pts = (jnp.clip(pts + jitter, 0.0, 1.0) * 2.0 - 1.0) * b

    n = pts.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    pts = jnp.concatenate([pts, jnp.zeros((pad, 3))]) if pad else pts
    sigmas = jax.lax.map(density_fn, pts.reshape(n_chunks, chunk, 3)).reshape(-1)[:n]
    new = jnp.maximum(grid.density * decay, sigmas.reshape(R, R, R))
    return grid._replace(density=new)


def occupancy_at(grid: OccupancyGrid, pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear occupancy lookup at world points (..., 3) → (...,)."""
    R = grid.resolution
    u = (pts / (2.0 * grid.bound) + 0.5) * R - 0.5  # cell-center coords
    u = jnp.clip(u, 0.0, R - 1.0)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, R - 2)
    w = u - i0
    d = grid.density

    def corner(dx, dy, dz):
        v = d[i0[..., 0] + dx, i0[..., 1] + dy, i0[..., 2] + dz]
        wx = w[..., 0] if dx else 1.0 - w[..., 0]
        wy = w[..., 1] if dy else 1.0 - w[..., 1]
        wz = w[..., 2] if dz else 1.0 - w[..., 2]
        return v * wx * wy * wz

    return sum(corner(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1))


def occupancy_at_nearest(grid: OccupancyGrid, pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-cell occupancy lookup — ONE flat gather per point (the
    trilinear version costs 8; for proposal weighting nearest is plenty and
    8x cheaper on TPU, where gathers dominate)."""
    R = grid.resolution
    u = (pts / (2.0 * grid.bound) + 0.5) * R
    idx = jnp.clip(u.astype(jnp.int32), 0, R - 1)
    flat = idx[..., 0] * (R * R) + idx[..., 1] * R + idx[..., 2]
    return jnp.take(grid.density.reshape(-1), flat, axis=0)


def occupancy_proposal(
    grid: OccupancyGrid,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_bins: jnp.ndarray,
    floor: float = 1e-2,
) -> jnp.ndarray:
    """Per-bin proposal weights ∝ occupancy at bin centers (nearest-cell).

    ``floor`` keeps a small uniform component so unseen space continues to
    receive samples (exploration — occupancy is only an EMA estimate).
    Returns (..., n_bins - 1) weights for sample_pdf.
    """
    mids = 0.5 * (z_bins[..., 1:] + z_bins[..., :-1])
    pts = rays_o[..., None, :] + rays_d[..., None, :] * mids[..., :, None]
    occ = occupancy_at_nearest(grid, pts)
    occ = occ / (jnp.max(occ, axis=-1, keepdims=True) + 1e-9)
    return occ + floor


def occupancy_sample(
    key,
    grid: OccupancyGrid,
    rays_o,
    rays_d,
    near,
    far,
    num_samples: int,
    num_bins: int = 64,
    deterministic: bool = False,
):
    """Occupancy-weighted depth sampling: uniform bins → occupancy PDF →
    inverse-CDF resample. Static shapes throughout."""
    n_rays = rays_o.shape[0]
    bins = jnp.broadcast_to(
        jnp.linspace(near, far, num_bins + 1, dtype=jnp.float32),
        (n_rays, num_bins + 1),
    )
    weights = occupancy_proposal(grid, rays_o, rays_d, bins)
    # stratified_u ⇒ samples come out sorted; no per-ray sort needed.
    return sample_pdf(
        key, bins, weights, num_samples,
        deterministic=deterministic, stratified_u=True,
    )
