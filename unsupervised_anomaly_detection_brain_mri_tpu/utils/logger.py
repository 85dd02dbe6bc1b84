"""TensorBoard logging — parity with `utils/logger.py` + `trainers/AEMODEL.py:37-42`.

The reference built TF1 summary ops per tag with per-phase FileWriters
(TRAIN/VAL/TEST); here tensorboardX writers fill the same role: scalar
means per epoch per phase, plus image grids (input | reconstruction |
L1 residual) capped at 50 rows like `trainers/AEMODEL.py:40`.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

PHASES = ("TRAIN", "VAL", "TEST")


class Logger:
    """Lazy per-phase SummaryWriters (`utils/logger.py:14-60`)."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        self._writers: Dict[str, "object"] = {}

    def _writer(self, phase: str):
        if phase not in self._writers:
            from tensorboardX import SummaryWriter

            path = os.path.join(self.logdir, phase.lower())
            os.makedirs(path, exist_ok=True)
            self._writers[phase] = SummaryWriter(path)
        return self._writers[phase]

    def log_scalars(self, step: int, scalars: Dict[str, float],
                    phase: str = "TRAIN") -> None:
        w = self._writer(phase)
        for tag, value in scalars.items():
            if np.isscalar(value) or np.ndim(value) == 0:
                w.add_scalar(tag, float(value), step)

    def log_visuals(self, step: int, x: np.ndarray, reconstruction: np.ndarray,
                    phase: str = "TRAIN", max_rows: int = 50) -> None:
        """hstack of normalized input | reconstruction | L1 residual
        (`trainers/trainer_utils.py:6-18`), <= max_rows rows."""
        n = min(x.shape[0], max_rows)
        rows = []
        for i in range(n):
            xi = np.squeeze(x[i]).astype(np.float32)
            ri = np.squeeze(reconstruction[i]).astype(np.float32)
            di = np.abs(xi - ri)

            def norm(a):
                lo, hi = a.min(), a.max()
                return (a - lo) / (hi - lo) if hi > lo else a * 0

            rows.append(np.hstack([norm(xi), norm(ri), norm(di)]))
        grid = np.vstack(rows)[None]  # (1, H*, W*) single-channel
        self._writer(phase).add_image(
            "reconstruction", grid, step, dataformats="CHW")

    def flush(self) -> None:
        for w in self._writers.values():
            w.flush()

    def close(self) -> None:
        for w in self._writers.values():
            w.close()
