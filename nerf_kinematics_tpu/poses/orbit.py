"""Synthetic orbit pose generation for test/video renders.

Reference semantics: parser_instant_ngp.py:63-125 — circular look-at orbits
around the scene center; 8 test poses at radius 50, and 60 video poses at
radius 40 with a 5*sin(4*theta) height wobble. Implemented vectorized over all
poses at once.
"""

from __future__ import annotations

import numpy as np


def _look_at_poses(positions: np.ndarray, center: np.ndarray) -> np.ndarray:
    """Build camera-to-world matrices looking from ``positions`` (N, 3) at
    ``center`` (3,), world-up = +Z.

    Column layout matches the reference construction
    (parser_instant_ngp.py:82-88): columns are [right, up, -forward, position],
    i.e. OpenGL camera convention with -Z forward.
    """
    forward = center[None, :] - positions
    forward = forward / np.linalg.norm(forward, axis=1, keepdims=True)
    world_up = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, world_up[None, :])
    right = right / np.linalg.norm(right, axis=1, keepdims=True)
    up = np.cross(right, forward)

    n = positions.shape[0]
    poses = np.zeros((n, 4, 4))
    poses[:, :3, 0] = right
    poses[:, :3, 1] = up
    poses[:, :3, 2] = -forward
    poses[:, :3, 3] = positions
    poses[:, 3, 3] = 1.0
    return poses


def generate_orbit_poses(
    center: np.ndarray,
    radius: float,
    n_poses: int,
    height_wobble: float = 0.0,
    wobble_freq: int = 4,
) -> np.ndarray:
    """(n_poses, 4, 4) camera-to-world poses on a circle of ``radius`` around
    ``center`` in the XY plane, optionally with a sinusoidal height offset."""
    center = np.asarray(center, dtype=np.float64)
    theta = 2.0 * np.pi * np.arange(n_poses) / n_poses
    positions = np.stack(
        [
            center[0] + radius * np.cos(theta),
            center[1] + radius * np.sin(theta),
            center[2] + height_wobble * np.sin(wobble_freq * theta),
        ],
        axis=1,
    )
    return _look_at_poses(positions, center)


def generate_test_poses(center, radius: float = 50.0, n_poses: int = 8) -> np.ndarray:
    """8 static test poses (parser_instant_ngp.py:63-91)."""
    return generate_orbit_poses(center, radius, n_poses)


def generate_video_poses(center, radius: float = 40.0, n_poses: int = 60) -> np.ndarray:
    """60 video poses with 5*sin(4*theta) height wobble
    (parser_instant_ngp.py:94-125)."""
    return generate_orbit_poses(center, radius, n_poses, height_wobble=5.0, wobble_freq=4)
