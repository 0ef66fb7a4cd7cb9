"""FlexibleNeRF model tests: parameter shapes must match the reference
checkpoint structure exactly (SURVEY.md §2.2 — checkpoints are ground truth)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_kinematics_tpu.models import FlexibleNeRF, FlexibleNeRFConfig


def _param_shapes(cfg):
    model = FlexibleNeRF(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 3)), jnp.zeros((2, 3))
    )
    return {k: v["kernel"].shape for k, v in params["params"].items()}, params, model


def test_lego_config_matches_checkpoint_shapes():
    """lego-lowres3 config: num_layers 8, hidden 128, L_xyz=10, L_dir=4 ⇒
    checkpoint110000.ckpt tensor shapes (flax kernels are (in, out) =
    transposed torch weights)."""
    cfg = FlexibleNeRFConfig()
    shapes, _, _ = _param_shapes(cfg)
    assert shapes == {
        "layer1": (63, 128),
        "layers_xyz_0": (128, 128),
        "layers_xyz_1": (128, 128),
        "layers_xyz_2": (128, 128),
        "fc_feat": (128, 128),
        "layers_dir_0": (155, 64),
        "fc_alpha": (128, 1),
        "fc_rgb": (64, 3),
    }


def test_wheel_config_matches_checkpoint_shapes():
    """wheel_robot6: L_xyz=6 ⇒ layer1 (39, 128)."""
    cfg = FlexibleNeRFConfig(num_encoding_fn_xyz=6)
    shapes, _, _ = _param_shapes(cfg)
    assert shapes["layer1"] == (39, 128)
    assert shapes["layers_dir_0"] == (155, 64)


def test_forward_shapes_and_grad():
    cfg = FlexibleNeRFConfig()
    model = FlexibleNeRF(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((5, 3)), jnp.zeros((5, 3)))
    xyz = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    vd = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    rgb, sigma = model.apply(params, xyz, vd)
    assert rgb.shape == (5, 3) and sigma.shape == (5,)

    def loss(p):
        r, s = model.apply(p, xyz, vd)
        return jnp.sum(r**2) + jnp.sum(s**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)
    assert any(jnp.abs(l).sum() > 0 for l in leaves)


def test_batched_over_sample_axis():
    """Model applies over arbitrary leading dims (rays, samples)."""
    cfg = FlexibleNeRFConfig(num_encoding_fn_xyz=6)
    model = FlexibleNeRF(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    pts = jnp.zeros((4, 16, 3))
    vd = jnp.zeros((4, 16, 3))
    rgb, sigma = model.apply(params, pts, vd)
    assert rgb.shape == (4, 16, 3) and sigma.shape == (4, 16)


def test_no_viewdirs_variant():
    cfg = FlexibleNeRFConfig(use_viewdirs=False)
    model = FlexibleNeRF(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    rgb, sigma = model.apply(params, jnp.ones((2, 3)))
    assert rgb.shape == (2, 3) and sigma.shape == (2,)


def test_sigma_head_independent_of_viewdir():
    """Density must not depend on view direction (physical constraint)."""
    cfg = FlexibleNeRFConfig()
    model = FlexibleNeRF(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((3, 3)), jnp.zeros((3, 3)))
    xyz = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
    _, s1 = model.apply(params, xyz, jnp.ones((3, 3)))
    _, s2 = model.apply(params, xyz, -jnp.ones((3, 3)))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_bf16_compute_close_to_f32():
    """bfloat16 compute path: same params, outputs within bf16 tolerance."""
    cfg32 = FlexibleNeRFConfig()
    cfg16 = FlexibleNeRFConfig(compute_dtype="bfloat16")
    m32, m16 = FlexibleNeRF(cfg32), FlexibleNeRF(cfg16)
    params = m32.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    xyz = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    vd = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    r32, s32 = m32.apply(params, xyz, vd)
    r16, s16 = m16.apply(params, xyz, vd)
    assert r16.dtype == jnp.float32  # outputs cast back
    np.testing.assert_allclose(np.asarray(r16), np.asarray(r32), atol=0.1)
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=0.15)
