"""Dataset container shared by all loaders."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Intrinsics:
    fl_x: float
    fl_y: float
    cx: float
    cy: float
    width: int
    height: int
    # OpenCV lens distortion (radial k1/k2, tangential p1/p2) — the schema
    # the pose converter emits (parser_instant_ngp.py:183-186) and
    # instant-ngp's nerf_loader applies during ray generation.
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0

    @property
    def focal(self) -> float:
        return self.fl_x

    @property
    def distortion(self):
        """(k1, k2, p1, p2) if any is nonzero, else None — ray generators
        skip the iterative undistortion entirely for the common pinhole case."""
        d = (self.k1, self.k2, self.p1, self.p2)
        return d if any(d) else None

    def scaled(self, factor: float) -> "Intrinsics":
        """Intrinsics after resizing the image by 1/factor. Distortion acts
        on normalized coordinates, so the coefficients are scale-invariant."""
        return Intrinsics(
            fl_x=self.fl_x / factor,
            fl_y=self.fl_y / factor,
            cx=self.cx / factor,
            cy=self.cy / factor,
            width=int(self.width / factor),
            height=int(self.height / factor),
            k1=self.k1, k2=self.k2, p1=self.p1, p2=self.p2,
        )


@dataclass
class NerfDataset:
    """Images + poses + intrinsics + split indices, ready for on-device upload.

    images: (N, H, W, 3) float32 in [0, 1] (alpha pre-composited).
    poses:  (N, 4, 4) float32 camera-to-world, OpenGL convention.
    """

    images: np.ndarray
    poses: np.ndarray
    intrinsics: Intrinsics
    near: float
    far: float
    train_idx: np.ndarray
    val_idx: np.ndarray
    test_idx: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    render_poses: Optional[np.ndarray] = None  # novel-view path (video orbits)
    use_ndc: bool = False
    aabb_scale: float = 1.0

    @property
    def H(self) -> int:
        return self.images.shape[1]

    @property
    def W(self) -> int:
        return self.images.shape[2]

    def split(self, name: str):
        idx = {"train": self.train_idx, "val": self.val_idx, "test": self.test_idx}[name]
        return self.images[idx], self.poses[idx]
