"""Per-frame sharpness scoring: variance of the 3x3 Laplacian.

Reference semantics: parser_instant_ngp.py:49-60 — grayscale image filtered
with the [0,1,0;1,-4,1;0,1,0] kernel through PIL (whose 'L'-mode kernel filter
clamps results to [0, 255]), then the variance of the filtered image.
"""

from __future__ import annotations

import numpy as np

_LAPLACIAN = [0, 1, 0, 1, -4, 1, 0, 1, 0]


def compute_sharpness(image_path) -> float:
    """Sharpness score = variance of the clamped 3x3 Laplacian of the
    grayscale image."""
    from PIL import Image, ImageFilter

    with Image.open(image_path) as img:
        gray = img.convert("L")
        lap = gray.filter(ImageFilter.Kernel((3, 3), _LAPLACIAN, scale=1, offset=0))
    return float(np.asarray(lap, dtype=np.float64).var())


def compute_sharpness_array(gray: np.ndarray) -> float:
    """Pure-numpy equivalent for in-memory grayscale uint8 arrays (used by
    tests and batch pipelines). Matches PIL semantics: interior-only 3x3
    convolution with edge rows/cols passed through unchanged, result clamped
    to [0, 255]."""
    g = gray.astype(np.float64)
    out = g.copy()
    interior = (
        g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:] - 4.0 * g[1:-1, 1:-1]
    )
    out[1:-1, 1:-1] = interior
    return float(np.clip(np.round(out), 0, 255).var())
