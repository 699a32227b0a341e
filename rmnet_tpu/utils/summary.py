"""TensorBoard summary writer wrapper (capability of reference
utils/summary_writer.py:17-35, minus the SenseTime-internal PAVI backend).

Uses torch.utils.tensorboard when available; degrades to an in-memory/JSONL
recorder otherwise so headless training never hard-depends on TensorBoard.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


class SummaryWriter:
    def __init__(self, log_dir: str, phase: str):
        self.log_dir = os.path.join(log_dir, phase)
        os.makedirs(self.log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._tb = TBWriter(self.log_dir)
        except Exception:
            self._jsonl = open(os.path.join(self.log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, global_step: Optional[int] = None):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step)
        else:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": global_step}) + "\n"
            )
            self._jsonl.flush()

    def add_image(self, tag: str, img_hwc: np.ndarray, global_step: Optional[int] = None):
        if self._tb is not None:
            self._tb.add_image(tag, img_hwc, global_step, dataformats="HWC")

    def close(self):
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()
