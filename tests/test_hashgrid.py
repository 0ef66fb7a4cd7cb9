"""Hash-grid encoder tests: vectorized encoder vs scalar reference, gradient
flow, config parity with the reference's logged GridEncoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.ops.hashgrid import (
    HashGridConfig,
    hash_encode,
    hash_encode_ref,
    init_table,
)
from nerf_kinematics_tpu.ops.sh import sh_encode


class TestHashGridConfig:
    def test_reference_dims(self):
        """Reference logged: Nmin=16 F=4 T=2^19 L=8, ~12.66M params
        (instant_ngp_collab_cloud.ipynb cell 23)."""
        cfg = HashGridConfig()
        assert cfg.out_dim == 32
        assert cfg.table_size == 524288
        assert cfg.n_params == 8 * 524288 * 4  # 16.8M capacity (12.7M logged
        # is table entries actually touched; we allocate the full table)

    def test_per_level_scale_in_reference_range(self):
        # b ≈ 2.0 for Nmax=2048; reference logs 2.21-2.44 for aabb-scaled Nmax.
        cfg = HashGridConfig()
        assert 1.9 < cfg.per_level_scale < 2.1
        cfg4 = HashGridConfig(max_resolution=4096)
        assert 2.1 < cfg4.per_level_scale < 2.3
        assert cfg.resolutions[0] == 16

    def test_dense_levels_fit_table(self):
        cfg = HashGridConfig()
        for res in cfg.resolutions:
            if (res + 1) ** 3 <= cfg.table_size:
                assert res <= 79  # dense cutoff for T=2^19


class TestHashEncode:
    @pytest.fixture(scope="class")
    def small(self):
        cfg = HashGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                             base_resolution=4, max_resolution=32)
        table = init_table(jax.random.PRNGKey(0), cfg) * 1e4  # O(1) values
        return cfg, table

    def test_matches_scalar_reference(self, small):
        cfg, table = small
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
        fast = np.asarray(hash_encode(table, x, cfg))
        slow = hash_encode_ref(table, x, cfg)
        np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)

    def test_batch_shape_preserved(self, small):
        cfg, table = small
        x = jnp.zeros((5, 7, 3))
        out = hash_encode(table, x, cfg)
        assert out.shape == (5, 7, cfg.out_dim)

    def test_continuity_across_cells(self, small):
        """Trilinear interpolation ⇒ the encoding is continuous at cell faces."""
        cfg, table = small
        eps = 1e-5
        # Point just below/above an interior grid plane of the coarsest level.
        x0 = jnp.array([[0.5 - eps, 0.3, 0.7]])
        x1 = jnp.array([[0.5 + eps, 0.3, 0.7]])
        a, b = hash_encode(table, x0, cfg), hash_encode(table, x1, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_gradients_flow_to_touched_entries_only(self, small):
        cfg, table = small
        x = jnp.array([[0.5, 0.5, 0.5]])

        def loss(t):
            return jnp.sum(hash_encode(t, x, cfg) ** 2)

        g = jax.grad(loss)(table)
        assert np.isfinite(np.asarray(g)).all()
        touched = (np.asarray(g) != 0).sum()
        assert 0 < touched <= cfg.n_levels * 8 * cfg.n_features

    def test_clamps_out_of_box(self, small):
        cfg, table = small
        inside = hash_encode(table, jnp.array([[0.0, 0.0, 0.0]]), cfg)
        outside = hash_encode(table, jnp.array([[-5.0, -1.0, -0.1]]), cfg)
        np.testing.assert_allclose(np.asarray(inside), np.asarray(outside))

    def test_jit_and_vmap(self, small):
        cfg, table = small
        f = jax.jit(lambda t, x: hash_encode(t, x, cfg))
        x = jax.random.uniform(jax.random.PRNGKey(2), (16, 3))
        np.testing.assert_allclose(
            np.asarray(f(table, x)),
            np.asarray(hash_encode(table, x, cfg)),
            rtol=1e-5,
            atol=1e-6,
        )


class TestSHEncode:
    def test_dims(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        for deg in (1, 2, 3, 4):
            assert sh_encode(d, deg).shape == (1, deg * deg)

    def test_constant_band(self):
        d = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        out = sh_encode(d, 4)
        np.testing.assert_allclose(np.asarray(out[:, 0]), 0.282095, rtol=1e-5)

    def test_orthonormality_monte_carlo(self):
        """SH basis functions are orthonormal over the sphere: estimate the
        Gram matrix by Monte-Carlo and compare to identity."""
        key = jax.random.PRNGKey(3)
        d = jax.random.normal(key, (200_000, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        y = np.asarray(sh_encode(d, 3))  # degree 3 → 9 funcs
        gram = 4 * np.pi * (y.T @ y) / y.shape[0]
        np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


class TestBoundarySemantics:
    def test_aabb_boundary_matches_reference(self):
        """Points exactly on the upper AABB face (x == 1.0) must interpolate
        toward vertex `res`, matching hash_encode_ref (clip-then-weight)."""
        cfg = HashGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                             base_resolution=4, max_resolution=32)
        table = init_table(jax.random.PRNGKey(3), cfg) * 1e4
        x = jnp.array(
            [[1.0, 1.0, 1.0], [1.0, 0.3, 0.7], [0.25, 1.0, 0.5], [0.0, 1.0, 1.0]]
        )
        fast = np.asarray(hash_encode(table, x, cfg))
        slow = hash_encode_ref(table, x, cfg)
        np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)

    def test_boundary_continuity(self):
        """Encoding approaching the face from inside converges to the
        on-face value (no weight-collapse discontinuity at x == 1)."""
        cfg = HashGridConfig(n_levels=2, n_features=2, log2_table_size=10,
                             base_resolution=4, max_resolution=8)
        table = init_table(jax.random.PRNGKey(4), cfg) * 1e4
        near = hash_encode(table, jnp.array([[1.0 - 1e-6, 0.4, 0.6]]), cfg)
        on = hash_encode(table, jnp.array([[1.0, 0.4, 0.6]]), cfg)
        np.testing.assert_allclose(np.asarray(near), np.asarray(on), atol=1e-3)
