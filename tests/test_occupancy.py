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
