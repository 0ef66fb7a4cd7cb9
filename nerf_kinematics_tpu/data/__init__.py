"""Dataset loaders: blender / llff (NDC) / robot (FK capture) / ngp transforms.

Loader registry mirrors the reference's ``dataset.type`` config values
(trained_models/nerf-pytorch/*/config.yml: ``type: blender`` / ``type: robot``;
llff evidenced by ``no_ndc``/``llffhold`` knobs; ngp transforms.json by
instant-ngp's nerf_loader.cu).
"""

from .types import NerfDataset
from .blender import load_blender
from .llff import load_llff
from .robot import load_robot
from .ngp_transforms import load_ngp_transforms
from .synthetic import make_synthetic_scene

LOADERS = {
    "blender": load_blender,
    "llff": load_llff,
    "robot": load_robot,
    "ngp": load_ngp_transforms,
    "synthetic": make_synthetic_scene,
}


def load_dataset(cfg, *, white_background: bool = False) -> NerfDataset:
    """Load the dataset described by a DatasetConfig (honoring ``cachedir``).

    ``white_background`` is the *train-settings* flag
    (``nerf.train.white_background``): blender-format RGBA ground truth is
    composited onto white when set, matching the reference, which composites
    GT with the same flag raw2outputs renders with — the loader must not
    diverge from the renderer or the loss is biased.
    """
    if cfg.type not in LOADERS:
        raise ValueError(f"unknown dataset type {cfg.type!r}; have {sorted(LOADERS)}")
    from .cache import cache_path, load_cached, save_cached

    kwargs = {"white_background": white_background} if cfg.type == "blender" else {}
    path = cache_path(cfg, extra=kwargs or None)
    if path is not None:
        cached = load_cached(path)
        if cached is not None:
            return cached
    ds = LOADERS[cfg.type](cfg, **kwargs)
    if path is not None:
        save_cached(path, ds)
    return ds


__all__ = [
    "NerfDataset",
    "load_dataset",
    "load_blender",
    "load_llff",
    "load_robot",
    "load_ngp_transforms",
    "make_synthetic_scene",
    "LOADERS",
]
