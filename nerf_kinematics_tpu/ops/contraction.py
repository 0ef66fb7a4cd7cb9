"""Scene contraction for large-AABB scenes (``aabb_scale`` > 2).

TPU-native equivalent of instant-ngp's cascaded occupancy grids
(src/testbed_nerf.cu supports aabb_scale up to 128 by nesting K =
log2(aabb_scale) grids, each covering a 2x larger volume at half the
resolution-per-unit). Cascades are a data-dependent level-select — a gather
per sample on TPU. Contraction achieves the same geometric resolution
falloff as ONE smooth, branch-free coordinate map (the mip-NeRF 360 idea,
here in the L∞ norm so the output is exactly a cube):

    contract(x) = x                          |x|∞ <= 1
                  (2 - 1/|x|∞) · x/|x|∞      |x|∞ >  1

maps all of R³ into [-2, 2]³: the central unit box keeps half the grid
axis (like NGP's finest cascade), and each doubling of distance costs a
constant slab of cells (like each coarser cascade). Both the occupancy
grid and the feature-grid encoder then operate in contracted space, so
one static-resolution grid serves unbounded scenes.

All maps are elementwise (VPU-friendly), statically shaped, and exactly
invertible — ``uncontract`` recovers world points for density sweeps.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9
_MAX = 2.0 - 1e-6  # contracted coords never quite reach the boundary


def contract(pts: jnp.ndarray, inner: float = 1.0) -> jnp.ndarray:
    """World points (..., 3) → contracted coords in [-2, 2]³.

    ``inner``: half-width (world units) of the central linear region —
    content inside [-inner, inner]³ is mapped linearly onto [-1, 1]³.
    """
    x = pts / inner
    n = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), _EPS)
    scale = jnp.where(n <= 1.0, 1.0, (2.0 - 1.0 / n) / n)
    return x * scale


def uncontract(u: jnp.ndarray, inner: float = 1.0) -> jnp.ndarray:
    """Inverse of :func:`contract`: contracted coords → world points.

    For |u|∞ = m in (1, 2): x = u / (m · (2 − m)); m is clamped just below
    2 so grid cells on the outer boundary map to finite (far) points.
    """
    m = jnp.clip(jnp.max(jnp.abs(u), axis=-1, keepdims=True), _EPS, _MAX)
    scale = jnp.where(m <= 1.0, 1.0, 1.0 / (m * (2.0 - m)))
    return u * scale * inner


def contract_to_unit(pts: jnp.ndarray, inner: float = 1.0) -> jnp.ndarray:
    """World points → [0, 1]³ (contracted cube rescaled) — the coordinate
    the feature-grid encoders and the occupancy grid consume."""
    return contract(pts, inner) * 0.25 + 0.5


def unit_to_world(u01: jnp.ndarray, inner: float = 1.0) -> jnp.ndarray:
    """Inverse of :func:`contract_to_unit` ([0,1]³ grid coords → world)."""
    return uncontract((u01 - 0.5) * 4.0, inner)
