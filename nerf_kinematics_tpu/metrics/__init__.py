"""Metrics: PSNR, throughput counters, parallax analysis, scalar logging."""

from .psnr import mse_to_psnr, psnr

__all__ = ["psnr", "mse_to_psnr"]
