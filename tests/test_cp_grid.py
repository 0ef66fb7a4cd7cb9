"""CP-factorized encoder tests: vectorized vs scalar reference, continuity,
gradient flow (all-matmul backward), and NGP-with-CP convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.ops.cp_grid import (
    CPGridConfig,
    cp_encode,
    cp_encode_ref,
    init_cp_lines,
)


@pytest.fixture(scope="module")
def small():
    cfg = CPGridConfig(n_levels=3, n_components=4, base_resolution=8,
                       max_resolution=32, chunk_size=64, use_bf16=False)
    lines = init_cp_lines(jax.random.PRNGKey(0), cfg)
    return cfg, lines


def test_bf16_close_to_f32(small):
    cfg, lines = small
    bf = CPGridConfig(**{**cfg.__dict__, "use_bf16": True})
    x = jax.random.uniform(jax.random.PRNGKey(9), (64, 3))
    a = np.asarray(cp_encode(lines, x, cfg))
    b = np.asarray(cp_encode(lines, x, bf))
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.01)


def test_matches_scalar_reference(small):
    cfg, lines = small
    x = jax.random.uniform(jax.random.PRNGKey(1), (37, 3))  # non-multiple of chunk
    fast = np.asarray(cp_encode(lines, x, cfg))
    slow = cp_encode_ref(lines, x, cfg)
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)


def test_chunking_invariant(small):
    cfg, lines = small
    big = CPGridConfig(**{**cfg.__dict__, "chunk_size": 4096})
    x = jax.random.uniform(jax.random.PRNGKey(2), (130, 3))
    np.testing.assert_allclose(
        np.asarray(cp_encode(lines, x, cfg)),
        np.asarray(cp_encode(lines, x, big)),
        rtol=1e-5, atol=1e-6,
    )


def test_continuity(small):
    cfg, lines = small
    eps = 1e-5
    a = cp_encode(lines, jnp.array([[0.5 - eps, 0.3, 0.7]]), cfg)
    b = cp_encode(lines, jnp.array([[0.5 + eps, 0.3, 0.7]]), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_gradients_flow(small):
    cfg, lines = small
    x = jax.random.uniform(jax.random.PRNGKey(3), (16, 3))

    def loss(ls):
        return jnp.sum(cp_encode(ls, x, cfg) ** 2)

    g = jax.grad(loss)(lines)
    for gl in g:
        assert np.isfinite(np.asarray(gl)).all()
        assert np.abs(np.asarray(gl)).sum() > 0


def test_out_dim_and_params():
    cfg = CPGridConfig(n_levels=4, n_components=16, base_resolution=64,
                       max_resolution=512, table_size=256)
    assert cfg.out_dim == 64
    assert cfg.resolutions == [64, 128, 256, 512]
    # Folded tables: every level stores exactly table_size entries per axis.
    assert cfg.n_params == 4 * 3 * 256 * 16


def test_fold_periodic_continuity():
    """At a fold boundary (pos crossing a multiple of table_size) the folded
    encoding must stay continuous because index wrap is periodic."""
    cfg = CPGridConfig(n_levels=1, n_components=4, base_resolution=64,
                       max_resolution=64, table_size=16, use_bf16=False)
    lines = init_cp_lines(jax.random.PRNGKey(0), cfg)
    # Effective res 64 with table 16 → folds at pos = 16, i.e. x = 0.25.
    eps = 1e-5
    a = cp_encode(lines, jnp.array([[0.25 - eps, 0.5, 0.5]]), cfg)
    b = cp_encode(lines, jnp.array([[0.25 + eps, 0.5, 0.5]]), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_pallas_interpret_matches_xla():
    from nerf_kinematics_tpu.ops.cp_grid_pallas import cp_encode_pallas, stack_lines

    cfg = CPGridConfig(n_levels=2, n_components=8, base_resolution=8,
                       max_resolution=32, table_size=16, use_bf16=False)
    lines = init_cp_lines(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (50, 3))
    ref = np.asarray(cp_encode(lines, x, cfg))
    out = np.asarray(cp_encode_pallas(stack_lines(lines, cfg), x, cfg, 32, True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    gp = jax.grad(lambda s: (cp_encode_pallas(s, x, cfg, 32, True) ** 2).sum())(
        stack_lines(lines, cfg)
    )
    gr = jax.grad(lambda ls: (cp_encode(ls, x, cfg) ** 2).sum())(lines)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(jnp.stack(gr)), rtol=1e-3, atol=1e-4
    )


def test_ngp_with_cp_encoder_converges():
    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config, NeRFConfig, OptimizerConfig
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    ds = make_synthetic_scene(n_views=9, resolution=32)
    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp",
            cp=CPGridConfig(n_levels=3, n_components=8, base_resolution=16,
                            max_resolution=128, chunk_size=16384),
            density_width=32, density_layers=2, color_width=32, color_layers=2,
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=32, num_fine=32, perturb=True),
            validation=RenderSettings(num_coarse=32, num_fine=32, perturb=False),
            num_random_rays=512,
        ),
        optimizer=OptimizerConfig(lr=1e-2),
    )
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False, donate=False)
    images, poses = jnp.asarray(ds.images), jnp.asarray(ds.poses)
    losses = []
    for _ in range(120):
        state, m = step(state, images, poses)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.4, (losses[0], losses[-1])


def test_hash_fold_matches_scalar_reference():
    """fold="hash": XLA, Pallas (interpret) and the scalar reference agree,
    including the exact int32 hash semantics (ops/cp_grid.py
    hash_fold_indices vs _hash_fold_ref)."""
    from nerf_kinematics_tpu.ops.cp_grid import (
        _hash_fold_ref,
        fold_salt,
        hash_fold_indices,
    )
    from nerf_kinematics_tpu.ops.cp_grid_pallas import (
        cp_encode_pallas,
        stack_lines,
    )

    for salt in [fold_salt(0, 0), fold_salt(4, 2)]:
        a = np.asarray(
            hash_fold_indices(jnp.arange(300, dtype=jnp.float32), 16, salt)
        ).astype(int)
        b = np.array([_hash_fold_ref(k, 16, salt) for k in range(300)])
        assert (a == b).all()

    cfg = CPGridConfig(n_levels=3, n_components=4, base_resolution=8,
                       max_resolution=64, table_size=16, chunk_size=64,
                       use_bf16=False, fold="hash")
    lines = init_cp_lines(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (53, 3))
    ref = cp_encode_ref(lines, x, cfg)
    np.testing.assert_allclose(np.asarray(cp_encode(lines, x, cfg)), ref,
                               rtol=1e-4, atol=1e-5)
    out_p = cp_encode_pallas(stack_lines(lines, cfg), x, cfg, 64, True)
    np.testing.assert_allclose(np.asarray(out_p), ref, rtol=1e-4, atol=1e-5)


def test_hash_fold_continuity():
    """Hashed folding stays piecewise-linear continuous: the departing
    row's weight reaches zero exactly at each cell boundary."""
    cfg = CPGridConfig(n_levels=1, n_components=4, base_resolution=64,
                       max_resolution=64, table_size=16, chunk_size=256,
                       use_bf16=False, fold="hash")
    lines = init_cp_lines(jax.random.PRNGKey(2), cfg)
    eps = 1e-5
    t = jnp.linspace(0.02, 0.98, 41)
    lo = jnp.stack([t - eps] * 3, axis=-1)
    hi = jnp.stack([t + eps] * 3, axis=-1)
    a = np.asarray(cp_encode(lines, lo, cfg))
    b = np.asarray(cp_encode(lines, hi, cfg))
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_hash_fold_gradients_flow():
    cfg = CPGridConfig(n_levels=2, n_components=4, base_resolution=8,
                       max_resolution=64, table_size=16, chunk_size=64,
                       use_bf16=False, fold="hash")
    lines = init_cp_lines(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (32, 3))

    def loss(ls):
        return (cp_encode(ls, x, cfg) ** 2).sum()

    g = jax.grad(loss)(lines)
    assert all(np.isfinite(np.asarray(gi)).all() for gi in g)
    assert any(float(jnp.abs(gi).max()) > 0 for gi in g)


def test_fold_cap_parity_and_rows():
    """fold_cap wraps only levels with R >= cap into the capped row count;
    XLA / Pallas / scalar reference stay in exact agreement, coarse levels
    are untouched, and level_rows reflects the capped contraction size."""
    from nerf_kinematics_tpu.ops.cp_grid_pallas import (
        cp_encode_pallas,
        stack_lines,
    )

    base = dict(n_levels=4, n_components=4, base_resolution=8,
                max_resolution=128, table_size=48, chunk_size=64,
                use_bf16=False)
    cfg = CPGridConfig(**base, fold="hash", fold_cap=32)
    # resolutions 8, 20, 51, 128 -> rows 16, 32, 32, 32 (capped at 32)
    rows = [cfg.level_rows(R) for R in cfg.resolutions]
    assert rows == [16, 32, 32, 32], rows
    assert [cfg.level_fold(R) for R in cfg.resolutions] == [0, 0, 32, 32]

    lines = init_cp_lines(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (41, 3))
    ref = cp_encode_ref(lines, x, cfg)
    np.testing.assert_allclose(np.asarray(cp_encode(lines, x, cfg)), ref,
                               rtol=1e-4, atol=1e-5)
    out_p = cp_encode_pallas(stack_lines(lines, cfg), x, cfg, 64, True)
    np.testing.assert_allclose(np.asarray(out_p), ref, rtol=1e-4, atol=1e-5)

    # Periodic fold_cap too.
    cfg_p = CPGridConfig(**base, fold="periodic", fold_cap=32)
    lines_p = init_cp_lines(jax.random.PRNGKey(2), cfg_p)
    ref_p = cp_encode_ref(lines_p, x, cfg_p)
    np.testing.assert_allclose(np.asarray(cp_encode(lines_p, x, cfg_p)),
                               ref_p, rtol=1e-4, atol=1e-5)
    out_pp = cp_encode_pallas(stack_lines(lines_p, cfg_p), x, cfg_p, 64, True)
    np.testing.assert_allclose(np.asarray(out_pp), ref_p, rtol=1e-4, atol=1e-5)
