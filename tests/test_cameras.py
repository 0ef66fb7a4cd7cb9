"""Camera/ray tests: pinhole geometry and NDC warp invariants."""

import jax.numpy as jnp
import numpy as np

from nerf_kinematics_tpu.cameras import get_ray_batch, get_rays, ndc_rays


def test_center_pixel_looks_down_minus_z():
    H, W, f = 4, 4, 10.0
    o, d = get_rays(H, W, f, jnp.eye(4))
    assert o.shape == (H, W, 3) and d.shape == (H, W, 3)
    np.testing.assert_allclose(np.asarray(o), 0.0)
    # Pixel at exactly the principal point (cx=2, cy=2) is pixel (2,2).
    np.testing.assert_allclose(np.asarray(d[2, 2]), [0.0, 0.0, -1.0], atol=1e-7)
    # Pixel right of center has +x direction; pixel above center (smaller row) +y.
    assert d[2, 3][0] > 0
    assert d[1, 2][1] > 0


def test_rays_rotate_with_pose():
    H = W = 3
    f = 5.0
    # Camera rotated 90° about x: camera -z maps to world -y... construct and check.
    c2w = jnp.array(
        [[1, 0, 0, 1.0], [0, 0, -1, 2.0], [0, 1, 0, 3.0], [0, 0, 0, 1]], dtype=jnp.float32
    )
    o, d = get_rays(H, W, f, c2w, cx=1.0, cy=1.0)  # principal point on pixel (1,1)
    np.testing.assert_allclose(np.asarray(o[0, 0]), [1.0, 2.0, 3.0])
    # Principal-axis dir = R @ [0,0,-1] = [0, 1, 0].
    center = np.asarray(d[1, 1])
    np.testing.assert_allclose(center, [0.0, 1.0, 0.0], atol=1e-6)


def test_ray_batch_matches_full_grid():
    H, W, f = 6, 8, 7.0
    c2w = jnp.eye(4)
    o_full, d_full = get_rays(H, W, f, c2w)
    pix = jnp.array([[0, 0], [3, 5], [5, 7]], dtype=jnp.float32)  # (row, col)
    o_b, d_b = get_ray_batch(pix, f, c2w, cx=W * 0.5, cy=H * 0.5)
    for k, (j, i) in enumerate([(0, 0), (3, 5), (5, 7)]):
        np.testing.assert_allclose(np.asarray(d_b[k]), np.asarray(d_full[j, i]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(o_b[k]), np.asarray(o_full[j, i]), rtol=1e-6)


def test_ndc_center_ray_maps_to_origin():
    H, W, f = 8, 8, 10.0
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    no, nd = ndc_rays(H, W, f, 1.0, o, d)
    # Central ray: x=y=0 preserved; o_z = 1 + 2*near/oz with oz=-1 → -1.
    np.testing.assert_allclose(np.asarray(no[0]), [0.0, 0.0, -1.0], atol=1e-6)
    # Direction z: -2*near/oz = 2 → ray spans [-1, 1] as t goes 0→1.
    np.testing.assert_allclose(np.asarray(nd[0]), [0.0, 0.0, 2.0], atol=1e-6)


def test_ndc_frustum_maps_into_unit_cube():
    H, W, f = 10, 10, 10.0
    # Rays through all pixels from origin, looking down -z.
    o, d = get_rays(H, W, f, jnp.eye(4))
    no, nd = ndc_rays(H, W, f, 1.0, o.reshape(-1, 3), d.reshape(-1, 3))
    # At t=1 (infinity), points reach x,y in [-1,1], z=1.
    end = no + nd
    assert (jnp.abs(end[:, :2]) <= 1.0 + 1e-5).all()
    np.testing.assert_allclose(np.asarray(end[:, 2]), 1.0, atol=1e-6)
