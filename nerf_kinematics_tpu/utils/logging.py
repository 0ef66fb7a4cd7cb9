"""Leveled structured logger.

Mirrors the reference fast stack's leveled console logger
(SUCCESS/INFO/WARNING/PROGRESS banners, instant_ngp_collab_cloud.ipynb cell 23
output) on top of stdlib logging, with two extra levels.
"""

from __future__ import annotations

import logging
import sys

SUCCESS = 25
PROGRESS = 15
logging.addLevelName(SUCCESS, "SUCCESS")
logging.addLevelName(PROGRESS, "PROGRESS")

_FORMAT = "%(asctime)s %(levelname)-8s %(name)s: %(message)s"
_configured = False


def _configure():
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    root = logging.getLogger("nerf_kinematics_tpu")
    root.addHandler(handler)
    root.setLevel(logging.INFO)
    # Keep propagation ON: the stdlib root logger has no handlers by default
    # (so nothing double-prints), while test harnesses (pytest caplog) and
    # host applications that attach root handlers still see our records.
    _configured = True


def get_logger(name: str = "nerf_kinematics_tpu") -> logging.Logger:
    _configure()
    if not name.startswith("nerf_kinematics_tpu"):
        name = f"nerf_kinematics_tpu.{name}"
    return logging.getLogger(name)


def success(logger: logging.Logger, msg: str, *args) -> None:
    logger.log(SUCCESS, msg, *args)


def progress(logger: logging.Logger, msg: str, *args) -> None:
    logger.log(PROGRESS, msg, *args)
