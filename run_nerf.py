#!/usr/bin/env python3
"""Reference-compatible entry point: ``python run_nerf.py --config configs/lego.yml``.

Thin shim over nerf_kinematics_tpu.cli.run_nerf (BASELINE.json requires this
invocation to keep working).
"""

from nerf_kinematics_tpu.cli.run_nerf import main

if __name__ == "__main__":
    main()
