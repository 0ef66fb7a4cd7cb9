"""Tests for render buffer, image IO, throughput meter, NaN guards."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_kinematics_tpu.io.image import (
    load_image,
    save_depth16,
    save_image,
    write_video,
)
from nerf_kinematics_tpu.rendering.render_buffer import (
    accumulate,
    new_buffer,
    tonemap,
)
from nerf_kinematics_tpu.utils.guards import assert_finite_tree, checked_step
from nerf_kinematics_tpu.utils.profiling import ThroughputMeter


def test_render_buffer_averages():
    buf = new_buffer(4, 4)
    buf = accumulate(buf, jnp.full((4, 4, 3), 1.0))
    buf = accumulate(buf, jnp.full((4, 4, 3), 3.0))
    np.testing.assert_allclose(np.asarray(buf.resolved), 2.0)
    assert int(buf.spp) == 2


def test_tonemap_srgb_bounds():
    x = jnp.array([[[0.0, 0.5, 1.5]]])
    y = np.asarray(tonemap(x))
    assert y[0, 0, 0] == 0.0
    assert y[0, 0, 2] == 1.0  # clamped
    assert 0.7 < y[0, 0, 1] < 0.8  # sRGB(0.5) ≈ 0.735


def test_image_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    back = load_image(p)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_depth16(tmp_path):
    from PIL import Image

    d = np.linspace(1, 5, 16).reshape(4, 4)
    p = str(tmp_path / "d.png")
    save_depth16(p, d)
    with Image.open(p) as im:
        arr = np.asarray(im)
    assert arr.dtype == np.int32 or arr.dtype == np.uint16
    assert arr.min() == 0 and arr.max() == 65535


def test_write_video_gif_fallback(tmp_path):
    frames = [np.full((8, 8, 3), i / 4.0) for i in range(5)]
    out = write_video(str(tmp_path / "v.gif"), frames, fps=5)
    import os

    assert out.endswith(".gif") and os.path.getsize(out) > 100


def test_throughput_meter():
    m = ThroughputMeter(window=10)
    assert m.rays_per_sec is None
    import time

    m.tick(100)
    time.sleep(0.01)
    m.tick(100)
    assert m.rays_per_sec > 0
    assert m.steps_per_sec > 0


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="a"):
        assert_finite_tree({"a": jnp.array([1.0, float("nan")])})


def test_checked_step_catches_nan():
    def bad_step(x):
        return jnp.log(x)  # nan for negative input

    wrapped = checked_step(bad_step)
    assert np.isfinite(float(wrapped(jnp.float32(2.0))))
    with pytest.raises(Exception):
        wrapped(jnp.float32(-1.0))
