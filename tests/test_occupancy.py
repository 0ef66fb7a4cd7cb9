"""Occupancy-grid tests: EMA update against an analytic field, trilinear
lookup, and sample concentration in occupied space."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_kinematics_tpu.ops.occupancy import (
    init_grid,
    occupancy_at,
    occupancy_sample,
    update_grid,
)


def _sphere_density(pts):
    """High density inside a r=0.4 sphere at origin."""
    r = jnp.linalg.norm(pts, axis=-1)
    return jnp.where(r < 0.4, 50.0, 0.0)


def test_update_learns_field():
    grid = init_grid(resolution=16, bound=1.0)
    grid = update_grid(grid, _sphere_density, jax.random.PRNGKey(0), chunk=1024)
    d = np.asarray(grid.density)
    # Center cells see the sphere, corner cells decayed toward 0.95.
    assert d[8, 8, 8] == 50.0
    assert d[0, 0, 0] <= 0.95 + 1e-6
    # Repeated updates decay empty space further.
    for i in range(3):
        grid = update_grid(grid, _sphere_density, jax.random.PRNGKey(i + 1), chunk=1024)
    assert float(np.asarray(grid.density)[0, 0, 0]) < 0.9


def test_trilinear_lookup_interpolates():
    grid = init_grid(resolution=8, bound=1.0)
    density = jnp.zeros((8, 8, 8)).at[3, 3, 3].set(8.0)
    grid = grid._replace(density=density)
    # At the exact center of cell (3,3,3): full value.
    center = (jnp.array([[3.5, 3.5, 3.5]]) / 8 * 2 - 1) * 1.0
    v = occupancy_at(grid, center)
    np.testing.assert_allclose(np.asarray(v), 8.0, rtol=1e-5)
    # Halfway to the next cell center: half.
    half = (jnp.array([[4.0, 3.5, 3.5]]) / 8 * 2 - 1) * 1.0
    np.testing.assert_allclose(np.asarray(occupancy_at(grid, half)), 4.0, rtol=1e-5)


def test_samples_concentrate_in_occupied_space():
    grid = init_grid(resolution=32, bound=1.0)
    grid = update_grid(grid, _sphere_density, jax.random.PRNGKey(0), chunk=4096)
    # Decay empty space well below the floor's relative weight.
    for i in range(60):
        grid = grid._replace(density=grid.density * 0.95)
        grid = update_grid(grid, _sphere_density, jax.random.PRNGKey(i), chunk=4096) \
            if i % 20 == 0 else grid

    # Ray through the sphere: from (-2, 0, 0) toward +x.
    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    z = occupancy_sample(jax.random.PRNGKey(1), grid, o, d, 1.0, 3.0, 128)
    pts = o + d * z[0][:, None]
    inside = (jnp.linalg.norm(pts, axis=-1) < 0.45).mean()
    # Sphere occupies 0.4 of the 2-unit segment uniformly; importance
    # sampling should concentrate far more than that.
    assert float(inside) > 0.6
    assert (jnp.diff(z[0]) >= 0).all()


def test_proxy_lookups_bound_the_grid():
    """Both gather-free proxies are UPPER bounds of the exact nearest-cell
    lookup (conservative: occupied space never loses proposal weight), and
    the visual hull is at least as tight as the 1D projection proxy."""
    from nerf_kinematics_tpu.ops.occupancy import (
        _linear_to_unit,
        axis_projections,
        occupancy_at_nearest,
        occupancy_at_projected,
        occupancy_at_hull,
        pair_projections,
    )

    key = jax.random.PRNGKey(3)
    grid = init_grid(resolution=16, bound=1.0)
    grid = grid._replace(
        density=jax.random.uniform(key, (16, 16, 16)) ** 4 * 10.0
    )
    pts = jax.random.uniform(
        jax.random.PRNGKey(4), (512, 3), minval=-1.0, maxval=1.0
    )
    to_unit = _linear_to_unit(grid)
    exact = np.asarray(occupancy_at_nearest(grid, pts))
    hull = np.asarray(occupancy_at_hull(pair_projections(grid), pts, to_unit))
    proj1d = np.asarray(
        occupancy_at_projected(axis_projections(grid), pts, to_unit)
    )
    # bf16 matmul lookups: allow a small relative tolerance on the bounds.
    tol = 1e-2 * exact.max()
    assert (hull >= exact - tol).all(), "hull must upper-bound the grid"
    assert (proj1d >= hull - tol).all(), "1D proxy must upper-bound the hull"
    # Tightness: hull should beat the 1D proxy on average for a random field.
    assert hull.mean() < proj1d.mean()


def test_occupancy_sample_modes_agree_on_simple_field():
    """All three proposal modes concentrate samples inside the occupied
    sphere on a simple scene."""
    grid = init_grid(resolution=32, bound=1.0)
    grid = update_grid(grid, _sphere_density, jax.random.PRNGKey(0), decay=0.0)
    n_rays = 64
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n_rays, 1))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n_rays, 1))
    for mode in ("grid", "hull", "projected"):
        z = occupancy_sample(
            jax.random.PRNGKey(1), grid, rays_o, rays_d, 0.5, 3.5, 32,
            mode=mode,
        )
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        inside = jnp.linalg.norm(pts, axis=-1) < 0.5
        frac = float(inside.mean())
        assert frac > 0.55, (mode, frac)


def test_hull_pallas_kernel_matches_xla(tmp_path):
    """Interpret-mode parity of the hull Pallas kernel vs the XLA form."""
    from nerf_kinematics_tpu.ops.occupancy import (
        _linear_to_unit,
        occupancy_at_hull,
        pair_projections,
    )
    from nerf_kinematics_tpu.ops.occupancy_pallas import (
        occupancy_at_hull_pallas,
    )

    key = jax.random.PRNGKey(5)
    grid = init_grid(resolution=24, bound=1.0)
    grid = grid._replace(density=jax.random.uniform(key, (24, 24, 24)) * 5.0)
    pts = jax.random.uniform(
        jax.random.PRNGKey(6), (1000, 3), minval=-1.0, maxval=1.0
    )
    to_unit = _linear_to_unit(grid)
    p2 = pair_projections(grid)
    ref = occupancy_at_hull(p2, pts, to_unit)
    xt = to_unit(pts).reshape(-1, 3).T
    out = occupancy_at_hull_pallas(p2, xt, block=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def _asym_density(pts):
    """Off-axis blob at (0.6, -0.2, 0.1): x/z-asymmetric on purpose —
    regression for the round-2 write/read axis mismatch where density
    written at (x, y, z) read back at the x/z-mirrored point."""
    c = jnp.array([0.6, -0.2, 0.1])
    r = jnp.linalg.norm(pts - c, axis=-1)
    return jnp.where(r < 0.25, 40.0, 0.0)


def test_full_sweep_write_read_axis_order():
    grid = init_grid(resolution=32, bound=1.0)
    grid = update_grid(grid, _asym_density, jax.random.PRNGKey(0), decay=0.0)
    at_blob = jnp.array([[0.6, -0.2, 0.1]])
    mirrored = jnp.array([[0.1, -0.2, 0.6]])
    assert float(occupancy_at(grid, at_blob)[0]) > 20.0
    assert float(occupancy_at(grid, mirrored)[0]) < 1.0


def test_incremental_write_read_axis_order():
    from nerf_kinematics_tpu.ops.occupancy import (
        occupancy_at_nearest,
        update_grid_incremental,
    )

    grid = init_grid(resolution=16, bound=1.0)
    grid = grid._replace(density=jnp.zeros_like(grid.density))
    # Query every cell so the scatter covers the blob deterministically.
    grid = update_grid_incremental(
        grid, _asym_density, jax.random.PRNGKey(1), n_cells=16 ** 3 * 4,
        decay=0.0,
    )
    at_blob = jnp.array([[0.6, -0.2, 0.1]])
    mirrored = jnp.array([[0.1, -0.2, 0.6]])
    assert float(occupancy_at_nearest(grid, at_blob)[0]) > 20.0
    assert float(occupancy_at_nearest(grid, mirrored)[0]) < 1.0


def test_hull_proposal_tracks_asymmetric_blob():
    """The flagship hull proposal must concentrate samples at the true blob
    location, not its mirror, for an x/z-asymmetric field."""
    grid = init_grid(resolution=32, bound=1.0)
    grid = update_grid(grid, _asym_density, jax.random.PRNGKey(0), decay=0.0)
    # Ray along +x through the blob's (y, z) = (-0.2, 0.1) line.
    o = jnp.array([[-2.0, -0.2, 0.1]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    z = occupancy_sample(
        jax.random.PRNGKey(2), grid, o, d, 1.0, 3.0, 64, mode="hull"
    )
    x_hits = (o + d * z[0][:, None])[:, 0]
    # Blob spans x in [0.35, 0.85]; most samples should land there.
    frac = float(((x_hits > 0.3) & (x_hits < 0.9)).mean())
    assert frac > 0.6, frac


def test_unknown_proposal_mode_raises():
    import pytest

    grid = init_grid(resolution=8, bound=1.0)
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    with pytest.raises(ValueError, match="hulll"):
        occupancy_sample(
            jax.random.PRNGKey(0), grid, o, d, 0.1, 2.0, 8, mode="hulll"
        )
