"""machina-LLFF writer → llff loader roundtrip on real on-disk files.

Closes the round-1 gap that the LLFF path was only ever fixture-tested:
here the writer emits the true LLFF layout (poses_bounds.npy + images/)
and load_llff exercises its full real-data path on it.
"""

import os

import numpy as np
import pytest

from nerf_kinematics_tpu.data.llff import load_llff
from nerf_kinematics_tpu.data.machina_llff import (
    forward_facing_poses,
    nerf_to_llff_pose,
    write_machina_llff_dataset,
)


class _Cfg:
    def __init__(self, basedir, **kw):
        self.basedir = basedir
        self.type = "llff"
        self.no_ndc = kw.get("no_ndc", False)
        self.llffhold = kw.get("llffhold", 4)
        self.downsample_factor = kw.get("downsample_factor", 1)


def test_pose_block_roundtrips_through_loader_permutation():
    poses = forward_facing_poses(5, seed=2)
    for c2w in poses:
        block = nerf_to_llff_pose(c2w, 64, 64, 80.0)  # (3, 5)
        assert block.shape == (3, 5)
        # Apply the loader's permutation; must recover the NeRF pose.
        back = np.concatenate(
            [block[:, 1:2], -block[:, 0:1], block[:, 2:4]], axis=1
        )
        np.testing.assert_allclose(back, c2w[:3, :4], atol=1e-6)
        np.testing.assert_allclose(block[:, 4], [64, 64, 80.0])


def test_write_and_load_llff_dataset(tmp_path):
    out = str(tmp_path / "mllff")
    write_machina_llff_dataset(out, resolution=48, n_views=6, seed=3,
                               n_samples=48)
    assert os.path.isfile(os.path.join(out, "poses_bounds.npy"))
    assert len(os.listdir(os.path.join(out, "images"))) == 6
    pb = np.load(os.path.join(out, "poses_bounds.npy"))
    assert pb.shape == (6, 17)
    assert (pb[:, 15] > 0).all() and (pb[:, 16] > pb[:, 15]).all()

    ds = load_llff(_Cfg(out))
    assert ds.images.shape == (6, 48, 48, 3)
    assert ds.use_ndc and ds.near == 0.0 and ds.far == 1.0
    assert len(ds.val_idx) == 2 and len(ds.train_idx) == 4
    # Forward-facing: after recentering, every camera looks roughly along
    # the average view axis (z of the recentered rig ≈ -z world for NeRF
    # camera-to-world back vectors clustered together).
    backs = ds.poses[:, :3, 2]
    mean_back = backs.mean(0)
    mean_back /= np.linalg.norm(mean_back)
    cos = backs @ mean_back / np.linalg.norm(backs, axis=1)
    assert (cos > 0.9).all(), cos
    # Scene content sits in front of every camera (positive NDC-safe depth):
    # bd_factor rescale puts min bound at ~1.33.
    pb_scaled = pb[:, 15].min() * (1.0 / (pb[:, 15:17].min() * 0.75))
    assert pytest.approx(1.333, rel=0.01) == pb_scaled
    # Images are white-background composites: corners are white.
    corners = ds.images[:, 0, 0]
    assert (corners > 0.95).all()


def test_loader_downsample_factor(tmp_path):
    out = str(tmp_path / "mllff2")
    write_machina_llff_dataset(out, resolution=48, n_views=4, seed=5,
                               n_samples=32)
    ds = load_llff(_Cfg(out, downsample_factor=2, llffhold=2))
    assert ds.images.shape == (4, 24, 24, 3)
    assert ds.intrinsics.width == 24 and ds.intrinsics.height == 24
