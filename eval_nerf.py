#!/usr/bin/env python3
"""Reference-compatible alias: evaluate a trained classic-NeRF run
(the upstream stack's eval_nerf.py role — render held-out views + PSNR):

    python eval_nerf.py --config configs/lego.yml [--load-checkpoint path]
"""

import sys

from nerf_kinematics_tpu.cli.run_nerf import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--eval"])
