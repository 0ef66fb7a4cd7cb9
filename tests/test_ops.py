"""Core-op tests: positional encoding, samplers, compositing — analytic golden
cases per the test strategy in SURVEY.md §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.ops import (
    encoding_dim,
    positional_encoding,
    raw2outputs,
    sample_pdf,
    stratified_sample,
)
from nerf_kinematics_tpu.ops.sampling import hierarchical_sample


class TestPositionalEncoding:
    def test_dims_match_reference_checkpoints(self):
        # L=10 xyz → 63 (layer1.weight (128,63)); L=4 dir → 27; L=6 → 39 (wheel).
        assert encoding_dim(3, 10, True) == 63
        assert encoding_dim(3, 4, True) == 27
        assert encoding_dim(3, 6, True) == 39

    def test_analytic_values(self):
        x = jnp.array([[0.5, 0.0, -0.25]])
        enc = positional_encoding(x, 2, include_input=True, log_sampling=True)
        assert enc.shape == (1, 3 + 3 * 2 * 2)
        np.testing.assert_allclose(enc[0, :3], x[0], rtol=1e-6)
        # First band (freq 1): layout [sin(x), cos(x)] per frequency.
        np.testing.assert_allclose(enc[0, 3:6], np.sin([0.5, 0.0, -0.25]), rtol=1e-6)
        np.testing.assert_allclose(enc[0, 6:9], np.cos([0.5, 0.0, -0.25]), rtol=1e-6)
        # Second band (freq 2).
        np.testing.assert_allclose(enc[0, 9:12], np.sin([1.0, 0.0, -0.5]), rtol=1e-6)

    def test_no_input(self):
        enc = positional_encoding(jnp.zeros((4, 3)), 10, include_input=False)
        assert enc.shape == (4, 60)

    def test_linear_sampling(self):
        x = jnp.ones((1, 1))
        enc = positional_encoding(x, 3, include_input=False, log_sampling=False)
        # Frequencies linspace(1, 4, 3) = [1, 2.5, 4].
        np.testing.assert_allclose(
            enc[0, 0::2], np.sin([1.0, 2.5, 4.0]), rtol=1e-6
        )


class TestStratifiedSample:
    def test_deterministic_linspace(self):
        z = stratified_sample(jax.random.PRNGKey(0), 4, 8, 2.0, 6.0, perturb=False)
        assert z.shape == (4, 8)
        np.testing.assert_allclose(z[0], np.linspace(2, 6, 8), rtol=1e-6)

    def test_perturb_stays_in_bins(self):
        z0 = stratified_sample(jax.random.PRNGKey(0), 128, 16, 2.0, 6.0, perturb=False)
        z = stratified_sample(jax.random.PRNGKey(1), 128, 16, 2.0, 6.0, perturb=True)
        assert (z >= 2.0).all() and (z <= 6.0).all()
        # Samples remain sorted and within half-bin of the grid.
        assert (jnp.diff(z, axis=-1) > 0).all()
        assert jnp.abs(z - z0).max() <= (6.0 - 2.0) / 15 + 1e-6

    def test_lindisp(self):
        z = stratified_sample(jax.random.PRNGKey(0), 1, 3, 1.0, 4.0, perturb=False, lindisp=True)
        # Linear in disparity: 1/z linspace(1, 0.25, 3) → z = [1, 1.6, 4].
        np.testing.assert_allclose(z[0], [1.0, 1.6, 4.0], rtol=1e-5)

    def test_per_ray_bounds(self):
        near = jnp.array([1.0, 2.0])
        far = jnp.array([2.0, 4.0])
        z = stratified_sample(jax.random.PRNGKey(0), 2, 4, near, far, perturb=False)
        np.testing.assert_allclose(z[0], np.linspace(1, 2, 4), rtol=1e-6)
        np.testing.assert_allclose(z[1], np.linspace(2, 4, 4), rtol=1e-6)


class TestSamplePdf:
    def test_concentrates_on_heavy_bin(self):
        bins = jnp.linspace(0, 1, 9)[None].repeat(2, 0)  # 8 bins
        w = jnp.zeros((2, 8)).at[:, 3].set(1.0)  # all mass in bin 3 ([0.375, 0.5])
        s = sample_pdf(jax.random.PRNGKey(0), bins, w, 64)
        frac_in_bin = ((s >= 0.375) & (s <= 0.5)).mean()
        assert frac_in_bin > 0.95

    def test_uniform_weights_uniform_samples(self):
        bins = jnp.linspace(0, 1, 17)[None]
        w = jnp.ones((1, 16))
        s = sample_pdf(jax.random.PRNGKey(0), bins, w, 128, deterministic=True)
        np.testing.assert_allclose(np.asarray(s[0]), np.linspace(0, 1, 128), atol=1e-5)

    def test_zero_weights_no_nan(self):
        bins = jnp.linspace(0, 1, 5)[None]
        s = sample_pdf(jax.random.PRNGKey(0), bins, jnp.zeros((1, 4)), 16)
        assert jnp.isfinite(s).all()

    def test_hierarchical_merges_sorted(self):
        z = jnp.linspace(2, 6, 8)[None].repeat(3, 0)
        w = jnp.ones((3, 8))
        z_all = hierarchical_sample(jax.random.PRNGKey(0), z, w, 8)
        assert z_all.shape == (3, 16)
        assert (jnp.diff(z_all, axis=-1) >= 0).all()


class TestRaw2Outputs:
    def test_opaque_wall(self):
        """A single very dense sample → ray terminates there: rgb = sample color,
        depth = sample depth, acc = 1."""
        S = 8
        z = jnp.linspace(1.0, 2.0, S)[None]
        sigma = jnp.zeros((1, S)).at[0, 3].set(1e8)
        logit = 3.0
        rgb_raw = jnp.full((1, S, 3), logit)
        d = jnp.array([[0.0, 0.0, 1.0]])
        out = raw2outputs(rgb_raw, sigma, z, d)
        np.testing.assert_allclose(out.acc[0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(out.depth[0], z[0, 3], rtol=1e-5)
        np.testing.assert_allclose(out.rgb[0], jax.nn.sigmoid(logit), rtol=1e-5)

    def test_empty_space(self):
        S = 8
        z = jnp.linspace(1.0, 2.0, S)[None]
        out = raw2outputs(jnp.zeros((1, S, 3)), jnp.full((1, S), -1e9), z, jnp.ones((1, 3)))
        np.testing.assert_allclose(out.acc[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(out.rgb[0], 0.0, atol=1e-6)

    def test_white_background(self):
        S = 4
        z = jnp.linspace(1.0, 2.0, S)[None]
        out = raw2outputs(
            jnp.zeros((1, S, 3)),
            jnp.full((1, S), -1e9),
            z,
            jnp.ones((1, 3)),
            white_background=True,
        )
        np.testing.assert_allclose(out.rgb[0], 1.0, atol=1e-6)

    def test_analytic_two_sample_transmittance(self):
        """Check α/weight math against hand-computed values."""
        z = jnp.array([[1.0, 2.0]])
        sigma = jnp.array([[0.5, 0.7]])
        d = jnp.array([[0.0, 0.0, 2.0]])  # ||d||=2 scales the interval
        rgb_raw = jnp.zeros((1, 2, 3))
        out = raw2outputs(rgb_raw, sigma, z, d)
        # dist0 = (2-1)*2 = 2, dist1 = 1e10*2.
        a0 = 1 - np.exp(-0.5 * 2)
        a1 = 1.0  # saturates over the unbounded last interval
        w0, w1 = a0, (1 - a0) * a1
        np.testing.assert_allclose(out.weights[0], [w0, w1], rtol=1e-5)
        np.testing.assert_allclose(out.acc[0], w0 + w1, rtol=1e-5)

    def test_noise_requires_key_and_changes_output(self):
        z = jnp.linspace(1, 2, 8)[None]
        rgb = jnp.zeros((1, 8, 3))
        sig = jnp.ones((1, 8))
        d = jnp.ones((1, 3))
        with pytest.raises(ValueError):
            raw2outputs(rgb, sig, z, d, noise_std=0.2)
        o1 = raw2outputs(rgb, sig, z, d, noise_std=0.2, noise_key=jax.random.PRNGKey(0))
        o2 = raw2outputs(rgb, sig, z, d, noise_std=0.2, noise_key=jax.random.PRNGKey(1))
        assert not np.allclose(o1.weights, o2.weights)
