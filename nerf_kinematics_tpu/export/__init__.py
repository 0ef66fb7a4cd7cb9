"""Export: mesh extraction (native C++ core), PLY writing, screenshots, video."""

from .mesh import extract_mesh, save_ply, extract_mesh_from_engine

__all__ = ["extract_mesh", "save_ply", "extract_mesh_from_engine"]
