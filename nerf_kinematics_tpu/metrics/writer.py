"""Scalar metric writers: JSONL (always) + TensorBoard (when available).

The reference logs four canonical scalars — train/val x loss/PSNR — to
TensorBoard (exported curves at results/wheel/nerf-pytorch/loss/*.png,
SURVEY.md §5.5). ScalarWriter mirrors that: every scalar goes to a
machine-readable ``metrics.jsonl``, and to TensorBoard event files when a
SummaryWriter implementation is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class ScalarWriter:
    def __init__(self, logdir: str, enable_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=logdir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        rec = {"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
