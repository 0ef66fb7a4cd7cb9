"""Camera layer: intrinsics, ray generation, NDC warp. Pure jnp, vmap-first."""

from .rays import get_rays, get_ray_batch, ndc_rays

__all__ = ["get_rays", "get_ray_batch", "ndc_rays"]
