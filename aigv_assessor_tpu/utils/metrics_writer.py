"""Scalar metrics writer: JSONL always, TensorBoard when available.

Replaces the reference's `--report_to tensorboard` (HF Trainer +
tensorboardX, `shell/train/stage1_train.sh:63`): every scalar goes to an
append-only `metrics.jsonl` (greppable, survives without TB deps), and to a
TensorBoard event file when `tensorboardX` or `torch.utils.tensorboard` is
importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsWriter:
    def __init__(self, logdir: str, enable_tensorboard: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tensorboard:
            self._tb = self._try_tb(logdir)

    @staticmethod
    def _try_tb(logdir):
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(logdir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter

                return SummaryWriter(logdir)
            except Exception:
                return None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except Exception:
                    pass

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
