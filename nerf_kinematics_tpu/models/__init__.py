"""Model families: classic FlexibleNeRF MLPs and the Instant-NGP-class model."""

from .flexible_nerf import FlexibleNeRF, FlexibleNeRFConfig

__all__ = ["FlexibleNeRF", "FlexibleNeRFConfig"]
