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

    @property
    def focal(self) -> float:
        return self.fl_x

    def scaled(self, factor: float) -> "Intrinsics":
        """Intrinsics after resizing the image by 1/factor."""
        return Intrinsics(
            fl_x=self.fl_x / factor,
            fl_y=self.fl_y / factor,
            cx=self.cx / factor,
            cy=self.cy / factor,
            width=int(self.width / factor),
            height=int(self.height / factor),
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
