"""PSNR metrics.

Two conventions, both used by the reference:
- float images in [0, 1]: PSNR = -10 log10(MSE) (training/validation curves,
  the `psnr` key stored in classic-NeRF checkpoints);
- uint8 images: PSNR = 20 log10(255 / sqrt(MSE)) (the manual cv2 evaluation
  in instant_ngp_collab_cloud.ipynb cell 31 — wheel: 7.37 dB).
"""

from __future__ import annotations

import numpy as np


def mse_to_psnr(mse, max_val: float = 1.0):
    import jax.numpy as jnp

    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def psnr(pred, target, max_val: float = 1.0) -> float:
    """PSNR between two images/arrays of the same shape and scale."""
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    if pred.shape != target.shape:
        raise ValueError(f"shape mismatch {pred.shape} vs {target.shape}")
    mse = float(np.mean((pred - target) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(max_val) - 10.0 * np.log10(mse)


def psnr_uint8(pred: np.ndarray, target: np.ndarray) -> float:
    """Reference cell-31 convention: uint8 pixels, peak 255."""
    return psnr(np.asarray(pred, np.float64), np.asarray(target, np.float64), max_val=255.0)
