"""Occupancy grid: density-aware sample placement with static shapes.

TPU-native equivalent of instant-ngp's occupancy-bitfield ray marching
(src/testbed_nerf.cu): the reference skips empty space with data-dependent
early exit — dynamic shapes XLA can't compile. Here the occupancy grid
instead *importance-weights* a fixed sample budget (SURVEY.md §7 "hard
parts"): a maintained EMA occupancy volume reweights each ray's stratified
bins (trilinear or nearest lookup) and resamples them through the inverse
CDF, so samples concentrate in occupied space while every shape stays
static.

Grid maintenance mirrors NGP's two modes (testbed_nerf.cu's
``update_density_grid``):
  * :func:`update_grid` — full sweep: query density at one jittered point
    per cell, EMA via max(decay·old, new). Periodic (expensive, exact).
  * :func:`update_grid_incremental` — NGP's steady-state rule: decay the
    WHOLE grid, re-query a random subset of cells, scatter-max the fresh
    densities in. Cheap enough to run every few dozen steps, so stale
    occupancy (the round-1 gap: full sweeps only every N steps) decays
    away between sweeps.

Large scenes (``aabb_scale`` > 2): all functions accept ``to_unit`` /
``from_unit`` coordinate maps so the grid can live in *contracted* space
(ops/contraction.py) — the TPU answer to the reference's occupancy
cascades. Defaults reproduce the linear [-bound, bound]³ grid.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .sampling import sample_pdf


class OccupancyGrid(NamedTuple):
    density: jnp.ndarray  # (R, R, R) EMA of queried densities
    bound: jnp.ndarray  # scalar: grid spans [-bound, bound]^3 (linear mode)

    @property
    def resolution(self) -> int:
        return self.density.shape[0]


def init_grid(resolution: int = 128, bound: float = 1.0) -> OccupancyGrid:
    """Optimistic init (all-occupied) so early training sees everything."""
    return OccupancyGrid(
        density=jnp.ones((resolution,) * 3, jnp.float32),
        bound=jnp.float32(bound),
    )


def _linear_to_unit(grid: OccupancyGrid):
    return lambda pts: pts / (2.0 * grid.bound) + 0.5


def _linear_from_unit(grid: OccupancyGrid):
    return lambda u01: (u01 * 2.0 - 1.0) * grid.bound


def _cell_points(grid: OccupancyGrid, key, from_unit):
    """World-space jittered cell-center points for every cell, (R³, 3)."""
    R = grid.resolution
    lin = (jnp.arange(R) + 0.5) / R  # cell centers in [0, 1]
    # Axis order matters: density is stored [x, y, z] (axis 0 = x) because
    # every lookup (occupancy_at*, the projections) indexes it that way.
    xs, ys, zs = jnp.meshgrid(lin, lin, lin, indexing="ij")
    u01 = jnp.stack([xs, ys, zs], -1).reshape(-1, 3)
    jitter = (jax.random.uniform(key, u01.shape) - 0.5) / R
    return from_unit(jnp.clip(u01 + jitter, 0.0, 1.0))


def update_grid(
    grid: OccupancyGrid,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    decay: float = 0.95,
    chunk: int = 65536,
    from_unit: Optional[Callable] = None,
) -> OccupancyGrid:
    """Full-sweep EMA update: query density at one jittered point per cell
    and take max(decay * old, new) — the NGP update rule, evaluated for ALL
    cells (no scatter; one dense write)."""
    from_unit = from_unit or _linear_from_unit(grid)
    R = grid.resolution
    pts = _cell_points(grid, key, from_unit)

    n = pts.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    pts = jnp.concatenate([pts, jnp.zeros((pad, 3))]) if pad else pts
    sigmas = jax.lax.map(density_fn, pts.reshape(n_chunks, chunk, 3)).reshape(-1)[:n]
    new = jnp.maximum(grid.density * decay, sigmas.reshape(R, R, R))
    return grid._replace(density=new)


def update_grid_incremental(
    grid: OccupancyGrid,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    n_cells: int = 65536,
    decay: float = 0.95,
    from_unit: Optional[Callable] = None,
) -> OccupancyGrid:
    """NGP steady-state maintenance: decay EVERY cell, re-query ``n_cells``
    uniformly random cells (static count — one gatherless density batch +
    one scatter-max outside the train step), so occupancy both fades where
    density shrank and refreshes where it grew, between full sweeps."""
    from_unit = from_unit or _linear_from_unit(grid)
    R = grid.resolution
    k_idx, k_jit = jax.random.split(key)
    idx = jax.random.randint(k_idx, (n_cells,), 0, R * R * R)
    # flat = ix*R² + iy*R + iz — the [x, y, z] layout every lookup uses.
    ix, rem = idx // (R * R), idx % (R * R)
    iy, iz = rem // R, rem % R
    centers = (jnp.stack([ix, iy, iz], -1).astype(jnp.float32) + 0.5) / R
    jitter = (jax.random.uniform(k_jit, centers.shape) - 0.5) / R
    pts = from_unit(jnp.clip(centers + jitter, 0.0, 1.0))
    sigmas = density_fn(pts)

    decayed = (grid.density * decay).reshape(-1)
    new = decayed.at[idx].max(sigmas)
    return grid._replace(density=new.reshape(R, R, R))


def occupancy_at(
    grid: OccupancyGrid, pts: jnp.ndarray, to_unit: Optional[Callable] = None
) -> jnp.ndarray:
    """Trilinear occupancy lookup at world points (..., 3) → (...,)."""
    to_unit = to_unit or _linear_to_unit(grid)
    R = grid.resolution
    u = to_unit(pts) * R - 0.5  # cell-center coords
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


def occupancy_at_nearest(
    grid: OccupancyGrid, pts: jnp.ndarray, to_unit: Optional[Callable] = None
) -> jnp.ndarray:
    """Nearest-cell occupancy lookup — ONE flat gather per point (the
    trilinear version costs 8; for proposal weighting nearest is plenty and
    8x cheaper on TPU, where gathers dominate)."""
    to_unit = to_unit or _linear_to_unit(grid)
    R = grid.resolution
    u = to_unit(pts) * R
    idx = jnp.clip(u.astype(jnp.int32), 0, R - 1)
    flat = idx[..., 0] * (R * R) + idx[..., 1] * R + idx[..., 2]
    return jnp.take(grid.density.reshape(-1), flat, axis=0)


def axis_projections(grid: OccupancyGrid) -> jnp.ndarray:
    """(R, 3) per-axis max-projections of the density grid.

    ``proj[t, a] = max over the other two axes of density`` — an upper bound
    of the true occupancy along each axis, the separable proxy used by
    :func:`occupancy_at_projected`. Three max-reduces over the grid (~µs);
    recompute freely inside the train step whenever the grid changes.
    """
    d = grid.density
    return jnp.stack(
        [d.max(axis=(1, 2)), d.max(axis=(0, 2)), d.max(axis=(0, 1))], axis=-1
    )


def occupancy_at_projected(
    proj: jnp.ndarray,
    pts: jnp.ndarray,
    to_unit: Callable,
) -> jnp.ndarray:
    """Separable occupancy proxy: min over axes of the per-axis projections,
    looked up with a one-hot MATMUL — zero gathers.

    Rationale: XLA's TPU gather runs ~140M elem/s (measured: 3.7 ms for the
    524k-point nearest-cell lookup in the 8192-ray train step), while a
    (P, R) one-hot contracted against (R, 3) is sub-millisecond MXU work.
    ``min(px[x], py[y], pz[z]) ≥ occ[x, y, z]`` — conservative: occupied
    cells always keep their weight; some empty "ghost" cells (the outer
    product of projections) get sampled too, which costs a few wasted
    samples, never lost content.
    """
    R = proj.shape[0]
    u = to_unit(pts)  # (..., 3) in [0, 1]
    idx = jnp.clip(u * R, 0.0, R - 1.0)  # nearest-cell coordinate
    flat = idx.reshape(-1, 3)
    iota = jnp.arange(R, dtype=jnp.float32)
    # Nearest-cell one-hot as a hat with width 1/2 (exact match of floor):
    # |p - t| < 0.5 ⇒ t == round(p - 0.5 + 0.5) == floor(p) for p ∈ [t, t+1).
    onehot = (jnp.abs(jnp.floor(flat)[..., None] - iota) < 0.5).astype(
        jnp.bfloat16
    )  # (P, 3, R)
    vals = jnp.einsum(
        "par,ra->pa", onehot, proj.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.min(vals, axis=-1).reshape(pts.shape[:-1])


def occupancy_proposal(
    grid: OccupancyGrid,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_bins: jnp.ndarray,
    floor: float = 1e-2,
    to_unit: Optional[Callable] = None,
) -> jnp.ndarray:
    """Per-bin proposal weights ∝ occupancy at bin centers (nearest-cell).

    ``floor`` keeps a small uniform component so unseen space continues to
    receive samples (exploration — occupancy is only an EMA estimate).
    Returns (..., n_bins - 1) weights for sample_pdf.
    """
    mids = 0.5 * (z_bins[..., 1:] + z_bins[..., :-1])
    pts = rays_o[..., None, :] + rays_d[..., None, :] * mids[..., :, None]
    occ = occupancy_at_nearest(grid, pts, to_unit=to_unit)
    occ = occ / (jnp.max(occ, axis=-1, keepdims=True) + 1e-9)
    return occ + floor


def pair_projections(grid: OccupancyGrid) -> jnp.ndarray:
    """(3, R, R) per-axis-pair max-projections: Pxy (max over z), Pxz (max
    over y), Pyz (max over x) — the visual-hull factorization of the grid.
    Three max-reduces (~µs); recompute freely inside the train step."""
    d = grid.density
    return jnp.stack(
        [d.max(axis=2), d.max(axis=1), d.max(axis=0)], axis=0
    )


def occupancy_at_hull(
    proj2: jnp.ndarray,
    pts: jnp.ndarray,
    to_unit: Callable,
) -> jnp.ndarray:
    """Visual-hull occupancy proxy: min of the three 2D pair-projections,
    each evaluated as a bilinear one-hot form — zero gathers.

    ``min(Pxy[x,y], Pxz[x,z], Pyz[y,z])`` bounds the true cell occupancy
    from above and is far tighter than the 1D-projection proxy (ghost cells
    need all THREE silhouettes to intersect — the classic visual-hull
    argument). Each lookup is wᵃᵀ P wᵇ via (P_pts, R) one-hot matmuls: MXU
    work instead of the ~140M elem/s XLA gather (measured A/B on machina:
    1D proxy costs 1.6 dB vs the exact grid; the hull recovers it).
    """
    R = proj2.shape[-1]
    u = to_unit(pts)
    idx = jnp.floor(jnp.clip(u * R, 0.0, R - 1.0))
    flat = idx.reshape(-1, 3)
    iota = jnp.arange(R, dtype=jnp.float32)
    oh = (jnp.abs(flat[..., None] - iota) < 0.5).astype(jnp.bfloat16)
    ox, oy, oz = oh[:, 0], oh[:, 1], oh[:, 2]  # (P, R) each
    p2 = proj2.astype(jnp.bfloat16)

    def bilinear(oa, P, ob):
        m = jax.lax.dot_general(
            oa, P, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P_pts, R)
        return jnp.sum(m * ob.astype(jnp.float32), axis=-1)

    v = jnp.minimum(
        bilinear(ox, p2[0], oy),
        jnp.minimum(bilinear(ox, p2[1], oz), bilinear(oy, p2[2], oz)),
    )
    return v.reshape(pts.shape[:-1])


def occupancy_proposal_hull(
    grid: OccupancyGrid,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_bins: jnp.ndarray,
    floor: float = 1e-2,
    to_unit: Optional[Callable] = None,
) -> jnp.ndarray:
    """Gather-free proposal weights from the visual-hull proxy
    (:func:`occupancy_at_hull`; VMEM-resident Pallas kernel on TPU).
    Same contract as :func:`occupancy_proposal`."""
    # The default linear map is elementwise, so the fast path below may
    # apply it to a (3, N) array; a caller-supplied to_unit (the contracted
    # map) expects (..., 3) and keeps the channels-last path.
    linear = to_unit is None
    to_unit = to_unit or _linear_to_unit(grid)
    proj2 = pair_projections(grid)
    mids = 0.5 * (z_bins[..., 1:] + z_bins[..., :-1])
    if jax.default_backend() == "tpu" and linear and rays_o.ndim == 2:
        from .occupancy_pallas import occupancy_at_hull_pallas

        # Build the kernel operand CHANNELS-FIRST directly — the obvious
        # (R, B, 3) points array costs a (R·B, 3) → (3, R·B) transpose of
        # ~6 MB per step on the 524k-point proposal batch.
        pts_cf = (rays_o.T[:, :, None]
                  + rays_d.T[:, :, None] * mids[None, :, :])  # (3, R, B)
        xt = to_unit(pts_cf.reshape(3, -1))
        occ = occupancy_at_hull_pallas(proj2, xt).reshape(mids.shape)
    elif jax.default_backend() == "tpu":
        from .occupancy_pallas import occupancy_at_hull_pallas

        pts = rays_o[..., None, :] + rays_d[..., None, :] * mids[..., :, None]
        xt = to_unit(pts).reshape(-1, 3).T
        occ = occupancy_at_hull_pallas(proj2, xt).reshape(pts.shape[:-1])
    else:
        pts = rays_o[..., None, :] + rays_d[..., None, :] * mids[..., :, None]
        occ = occupancy_at_hull(proj2, pts, to_unit)
    occ = occ / (jnp.max(occ, axis=-1, keepdims=True) + 1e-9)
    return occ + floor


def occupancy_proposal_projected(
    grid: OccupancyGrid,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_bins: jnp.ndarray,
    floor: float = 1e-2,
    to_unit: Optional[Callable] = None,
) -> jnp.ndarray:
    """Gather-free proposal weights from the separable projection proxy
    (:func:`occupancy_at_projected`). Same contract as
    :func:`occupancy_proposal`."""
    to_unit = to_unit or _linear_to_unit(grid)
    proj = axis_projections(grid)
    mids = 0.5 * (z_bins[..., 1:] + z_bins[..., :-1])
    pts = rays_o[..., None, :] + rays_d[..., None, :] * mids[..., :, None]
    occ = occupancy_at_projected(proj, pts, to_unit)
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
    to_unit: Optional[Callable] = None,
    mode: str = "grid",
    floor: float = 1e-2,
):
    """Occupancy-weighted depth sampling: uniform bins → occupancy PDF →
    inverse-CDF resample. Static shapes throughout. ``mode``: "grid" looks
    the 3D grid up per bin (exact, gather-bound); "hull" uses the 2D
    pair-projection visual-hull proxy (gather-free, near-exact); and
    "projected" the 1D axis-projection proxy (cheapest, loosest)."""
    n_rays = rays_o.shape[0]
    bins = jnp.broadcast_to(
        jnp.linspace(near, far, num_bins + 1, dtype=jnp.float32),
        (n_rays, num_bins + 1),
    )
    proposals = {
        "grid": occupancy_proposal,
        "projected": occupancy_proposal_projected,
        "hull": occupancy_proposal_hull,
    }
    if mode not in proposals:
        raise ValueError(
            f"unknown occupancy proposal mode {mode!r}; expected one of "
            f"{sorted(proposals)}"
        )
    proposal = proposals[mode]
    weights = proposal(grid, rays_o, rays_d, bins, to_unit=to_unit, floor=floor)
    # stratified_u ⇒ samples come out sorted; no per-ray sort needed.
    return sample_pdf(
        key, bins, weights, num_samples,
        deterministic=deterministic, stratified_u=True,
    )
