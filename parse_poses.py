#!/usr/bin/env python3
"""Reference-compatible pose converter entry point (parser_instant_ngp.py flags):

    python parse_poses.py --poses poses.txt --image_folder images_robot \
        --recenter --scale_trans 1.0 --output transforms.json
"""

from nerf_kinematics_tpu.cli.parse_poses import main

if __name__ == "__main__":
    main()
