"""Volume-rendering pipeline: coarse+fine hierarchical rendering."""

from .renderer import RenderSettings, render_rays, render_image

__all__ = ["RenderSettings", "render_rays", "render_image"]
