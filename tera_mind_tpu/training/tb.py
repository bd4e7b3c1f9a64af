"""TensorBoard metric writer (reference TensorBoardLogger usage,
experiment.py:186-191, 360-370).

Host-side only — uses torch's SummaryWriter when tensorboard is available
(torch ships in this image for checkpoint conversion already), else falls
back to a JSONL metrics file so training never depends on it.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import numpy as np


class MetricWriter:
    """Scalar/image writer: TensorBoard events + always a metrics.jsonl."""

    def __init__(self, logdir: str):
        self.dir = Path(logdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=str(self.dir))
        except Exception as e:  # pragma: no cover - environment dependent
            print(f"[tb] tensorboard unavailable ({e}); jsonl only",
                  flush=True)

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"ts": time.time(), "step": step, tag: float(value)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: (H, W) or (H, W, C) uint8."""
        if self._tb is not None:
            if img.ndim == 2:
                img = img[..., None]
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
