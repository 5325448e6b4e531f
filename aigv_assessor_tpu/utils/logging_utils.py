"""Logging setup with per-process levels.

Mirrors the reference's per-rank logging configuration
(`/root/reference/internvl/train/internvl/train/stage1_train.py:747-769`):
the primary process logs at INFO, workers at WARNING, with a consistent
format including the process index.
"""

from __future__ import annotations

import logging
import sys

import jax


def setup_logging(level: int = logging.INFO) -> logging.Logger:
    try:
        idx, count = jax.process_index(), jax.process_count()
    except Exception:
        idx, count = 0, 1
    effective = level if idx == 0 else logging.WARNING
    logging.basicConfig(
        level=effective,
        format=(
            f"%(asctime)s [p{idx}/{count}] %(levelname)s %(name)s: %(message)s"
        ),
        datefmt="%H:%M:%S",
        stream=sys.stdout,
        force=True,
    )
    return logging.getLogger("aigv_assessor_tpu")
