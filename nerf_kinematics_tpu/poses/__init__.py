"""Pose layer: robot forward-kinematics pose parsing and NeRF-convention conversion.

Reference behavior: /root/reference/parser_instant_ngp.py (360 LoC). This package
re-implements that pipeline as a vectorized, importable library; the CLI wrapper
lives in nerf_kinematics_tpu.cli.parse_poses.
"""

from .parser import parse_poses_file, parse_poses_text
from .normalize import (
    aabb_scale_for,
    normalize_poses,
    camera_centers,
)
from .orbit import generate_orbit_poses, generate_test_poses, generate_video_poses
from .sharpness import compute_sharpness
from .pipeline import ConversionResult, convert_poses

__all__ = [
    "parse_poses_file",
    "parse_poses_text",
    "aabb_scale_for",
    "normalize_poses",
    "camera_centers",
    "generate_orbit_poses",
    "generate_test_poses",
    "generate_video_poses",
    "compute_sharpness",
    "convert_poses",
    "ConversionResult",
]
