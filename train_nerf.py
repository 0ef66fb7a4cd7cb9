#!/usr/bin/env python3
"""Reference-compatible alias: the classic stack's ``train_nerf.py --config
<yaml>`` entry point (nerf-pytorch submodule CLI, SURVEY.md §1 L2)."""

from nerf_kinematics_tpu.cli.run_nerf import main

if __name__ == "__main__":
    main()
