"""Instant-NGP ``transforms.json`` loader (``dataset.type: ngp``).

TPU-native equivalent of instant-ngp's ``src/nerf_loader.cu``: loads the
transforms.json schema produced by the pose converter (camera_angle_x/y,
fl_x/fl_y, k1/k2/p1/p2, cx/cy, w/h, aabb_scale, frames[]), normalizes
rotations whose determinant drifts from 1 with the same warning the reference
logs ("Rotation of camera matrix in frame N has a scaling component
(determinant!=1). Normalizing" — instant_ngp_collab_cloud.ipynb cell 23
output), and resolves image paths relative to the JSON file — which also
fixes the reference's --test_transforms crash when the val JSON sits apart
from its images (cells 25/26).
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from .types import Intrinsics, NerfDataset

log = logging.getLogger(__name__)


def normalize_rotations(poses: np.ndarray, warn: bool = True) -> np.ndarray:
    """Rescale rotation blocks so det(R) == 1, warning per drifting frame."""
    poses = poses.copy()
    dets = np.linalg.det(poses[:, :3, :3])
    bad = np.abs(dets - 1.0) > 1e-4
    if warn:
        for i in np.nonzero(bad)[0]:
            log.warning(
                "Rotation of camera matrix in frame %d has a scaling component "
                "(determinant!=1). Normalizing.",
                int(i),
            )
    # det(sR) = s^3 det(R) ⇒ divide by cbrt(det) (sign-preserving).
    scale = np.cbrt(np.abs(dets))
    poses[:, :3, :3] /= scale[:, None, None]
    return poses


def _resolve(json_dir: str, file_path: str):
    """Resolve a frame's file_path: as-given, relative to the JSON, or by
    basename next to the JSON / in sibling image dirs. Extension-less paths
    (the blender transforms_*.json convention, e.g. "./train/r_0") get
    image extensions appended — matching instant-ngp's nerf_loader, so
    ``ngp_run`` consumes nerf_synthetic-style datasets directly."""
    candidates = [
        file_path,
        os.path.join(json_dir, file_path),
        os.path.join(json_dir, os.path.basename(file_path)),
        os.path.join(json_dir, "..", os.path.basename(file_path)),
    ]
    for parent in ("images", "images_robot"):
        candidates.append(os.path.join(json_dir, "..", parent, os.path.basename(file_path)))
    if not os.path.splitext(file_path)[1]:
        candidates += [c + ext for c in list(candidates)
                       for ext in (".png", ".jpg", ".jpeg")]
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None


def load_transforms_json(path: str, require_images: bool = True):
    """Load one transforms*.json → (images | None, poses, intrinsics, aabb).

    Frames without ``transform_matrix`` fall back to
    ``transform_matrix_start`` (the test-orbit schema).
    """
    from PIL import Image

    with open(path) as f:
        meta = json.load(f)
    json_dir = os.path.dirname(os.path.abspath(path))

    poses, images, missing = [], [], 0
    for i, fr in enumerate(meta["frames"]):
        mat = fr.get("transform_matrix", fr.get("transform_matrix_start"))
        if mat is None:
            raise ValueError(f"frame {i} in {path} has no transform matrix")
        img = None
        if "file_path" in fr:
            resolved = _resolve(json_dir, fr["file_path"])
            if resolved is not None:
                with Image.open(resolved) as im:
                    if im.mode in ("RGBA", "LA", "PA"):
                        # Alpha (blender-style synthetic): composite onto
                        # white — the reference's lego/synthetic convention
                        # (PIL's convert("RGB") would composite onto black
                        # and silently bias training against white-bg GT).
                        rgba = np.asarray(im.convert("RGBA"), np.float32) / 255.0
                        a = rgba[..., 3:4]
                        img = rgba[..., :3] * a + (1.0 - a)
                    else:
                        img = np.asarray(im.convert("RGB"), np.float32) / 255.0
        if img is None:
            missing += 1
            if require_images:
                continue
        poses.append(np.asarray(mat, np.float32))
        images.append(img)

    if missing and require_images:
        log.warning("%d/%d frames in %s had no resolvable image; skipped.",
                    missing, len(meta["frames"]), path)
    poses = normalize_rotations(np.stack(poses))

    w = int(meta.get("w") or (images[0].shape[1] if images and images[0] is not None else 0))
    h = int(meta.get("h") or (images[0].shape[0] if images and images[0] is not None else 0))
    if "fl_x" in meta:
        fl_x = float(meta["fl_x"])
        fl_y = float(meta.get("fl_y", fl_x))
    else:
        fl_x = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
        fl_y = float(meta.get("camera_angle_y") and 0.5 * h / np.tan(0.5 * meta["camera_angle_y"]) or fl_x)
    intr = Intrinsics(
        fl_x, fl_y, float(meta.get("cx", w / 2)), float(meta.get("cy", h / 2)), w, h,
        k1=float(meta.get("k1", 0.0)), k2=float(meta.get("k2", 0.0)),
        p1=float(meta.get("p1", 0.0)), p2=float(meta.get("p2", 0.0)),
    )
    aabb = float(meta.get("aabb_scale", 1.0))
    imgs = (
        np.stack([im for im in images if im is not None])
        if require_images and any(im is not None for im in images)
        else None
    )
    return imgs, poses, intr, aabb


def load_ngp_transforms(cfg) -> NerfDataset:
    """Dataset from a directory containing transforms.json (+ _val.json)."""
    base = cfg.basedir
    train_json = base if base.endswith(".json") else os.path.join(base, "transforms.json")
    imgs, poses, intr, aabb = load_transforms_json(train_json)
    if imgs is None:
        raise FileNotFoundError(f"no images resolvable from {train_json}")

    val_json = train_json.replace(".json", "_val.json")
    n_train = imgs.shape[0]
    if os.path.isfile(val_json):
        vimgs, vposes, _, _ = load_transforms_json(val_json)
        if vimgs is not None:
            imgs = np.concatenate([imgs, vimgs])
            poses = np.concatenate([poses, vposes])
    n_total = imgs.shape[0]

    video_json = train_json.replace(".json", "_test_video.json")
    render_poses = None
    if os.path.isfile(video_json):
        _, render_poses, _, _ = load_transforms_json(video_json, require_images=False)

    return NerfDataset(
        images=imgs,
        poses=poses,
        intrinsics=intr,
        near=float(getattr(cfg, "near", 0.05)),
        far=float(getattr(cfg, "far", max(aabb, 2.0))),
        train_idx=np.arange(n_train),
        val_idx=np.arange(n_train, n_total),
        render_poses=render_poses,
        use_ndc=False,
        aabb_scale=aabb,
    )
