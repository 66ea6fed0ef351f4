"""Logging + observability scaffold.

Parity targets: reference ``diffusion/utils/logger.py:9-85`` (rank-aware
file+stream logger with stale-log renaming), mmcv ``LogBuffer`` windowed
averaging, tensorboard trackers (``test_controlnet.py:521-525``), and the
``log_images`` panels (lq/pred/hq concatenations) every training module
emits.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import numpy as np

try:  # tensorboard via flax (tensorflow backend, baked in)
    from flax.metrics import tensorboard as _tb
except Exception:  # pragma: no cover
    _tb = None

import jax


def get_root_logger(
    log_file: Optional[str] = None, level: int = logging.INFO, name: str = "instarevive"
) -> logging.Logger:
    """Rank-aware logger: process 0 logs at `level`, others at ERROR."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    rank = jax.process_index()
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file and rank == 0:
        if os.path.exists(log_file):  # stale-log rename (logger.py:86-)
            ts = time.strftime("%Y%m%d_%H%M%S")
            os.rename(log_file, f"{log_file}.{ts}")
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(level if rank == 0 else logging.ERROR)
    logger.propagate = False
    return logger


class LogBuffer:
    """Windowed metric averaging (mmcv LogBuffer semantics)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._vals: Dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    def update(self, metrics: Dict[str, float]):
        for k, v in metrics.items():
            self._vals[k].append(float(v))

    def average(self) -> Dict[str, float]:
        return {k: float(np.mean(v)) for k, v in self._vals.items() if len(v)}

    def clear(self):
        self._vals.clear()


class MetricWriter:
    """Tensorboard writer (no-op off rank 0 or without TB available)."""

    def __init__(self, log_dir: str):
        self._w = None
        if _tb is not None and jax.process_index() == 0:
            self._w = _tb.SummaryWriter(log_dir)

    def scalars(self, step: int, metrics: Dict[str, float]):
        if self._w is None:
            return
        for k, v in metrics.items():
            self._w.scalar(k, float(v), step)

    def images(self, step: int, tag: str, imgs01: np.ndarray):
        """NHWC [0,1] panel (the log_images hook analog)."""
        if self._w is None:
            return
        self._w.image(tag, np.clip(imgs01, 0, 1), step, max_outputs=4)

    def flush(self):
        if self._w is not None:
            self._w.flush()


def log_images_panel(lq: np.ndarray, pred: np.ndarray, hq: Optional[np.ndarray] = None):
    """Horizontal lq|pred|hq concat (ImageLoggerMixin log_images panels)."""
    parts = [lq, pred] + ([hq] if hq is not None else [])
    return np.concatenate(parts, axis=2)
