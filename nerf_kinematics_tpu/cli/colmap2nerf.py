"""CLI: COLMAP text model → transforms.json.

Flag parity with the reference invocation (instant_ngp_collab_cloud.ipynb
cell 37): ``colmap2nerf --images <dir> --text <colmap_text_dir> --out
transforms.json``.
"""

from __future__ import annotations

import argparse

from ..poses.colmap import colmap_to_transforms


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="COLMAP TXT model → transforms.json")
    p.add_argument("--images", default="images", help="Image directory")
    p.add_argument("--text", default="colmap_text", help="COLMAP TXT model dir")
    p.add_argument("--out", default="transforms.json", help="Output JSON")
    p.add_argument("--aabb_scale", type=float, default=16.0)
    p.add_argument("--keep_colmap_coords", action="store_true",
                   help="Skip reorientation/recentering")
    p.add_argument("--no_sharpness", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    colmap_to_transforms(
        text_dir=args.text,
        images_dir=args.images,
        aabb_scale=args.aabb_scale,
        out_path=args.out,
        keep_colmap_coords=args.keep_colmap_coords,
        with_sharpness=not args.no_sharpness,
    )


if __name__ == "__main__":
    main()
