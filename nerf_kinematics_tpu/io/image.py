"""Image I/O helpers: PNG/JPEG save-load, 16-bit depth maps, GIF/video export.

Covers the reference's image-output surface (screenshot renders, GT-vs-render
pairs under results/, depth visualization; tinyexr/tinyobj wrappers →
PNG16 + PLY here). Video: ffmpeg when present, animated GIF fallback.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional, Sequence

import numpy as np


def save_image(path: str, img: np.ndarray) -> None:
    """Save a float [0,1] or uint8 (H, W, 3) image."""
    from PIL import Image

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def load_image(path: str) -> np.ndarray:
    """(H, W, 3) float32 in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def save_depth16(path: str, depth: np.ndarray, near: Optional[float] = None,
                 far: Optional[float] = None) -> None:
    """16-bit grayscale PNG depth map (normalized to [near, far])."""
    from PIL import Image

    d = np.asarray(depth, np.float64)
    lo = d.min() if near is None else near
    hi = d.max() if far is None else far
    norm = np.clip((d - lo) / max(hi - lo, 1e-12), 0, 1)
    Image.fromarray((norm * 65535).astype(np.uint16), mode="I;16").save(path)


def write_video(path: str, frames: Sequence[np.ndarray], fps: int = 30) -> str:
    """Write frames to mp4 via ffmpeg if available, else an animated GIF.
    Returns the path actually written."""
    from PIL import Image

    frames8 = [
        np.clip(np.asarray(f) * 255, 0, 255).astype(np.uint8)
        if np.asarray(f).dtype != np.uint8 else np.asarray(f)
        for f in frames
    ]
    if shutil.which("ffmpeg") and path.endswith(".mp4"):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            for i, f in enumerate(frames8):
                Image.fromarray(f).save(os.path.join(td, f"f_{i:05d}.png"))
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-framerate", str(fps),
                 "-i", os.path.join(td, "f_%05d.png"),
                 "-pix_fmt", "yuv420p", path],
                check=True,
            )
        return path
    gif = path if path.endswith(".gif") else os.path.splitext(path)[0] + ".gif"
    imgs = [Image.fromarray(f) for f in frames8]
    imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return gif
