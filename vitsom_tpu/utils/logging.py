"""TensorBoard metric logging with reference-matching tag names.

The reference logs through Lightning's TensorBoardLogger
(``/root/reference/experiments/benchmarking/train_vit_som.py:78``) with tags
like ``train/recon_loss``, ``train/som_loss``, ``val/accuracy``, ``hp/gamma``.
Same tags here so existing dashboards carry over.

Events are written by the FIRST-PARTY writer (``utils/tb_writer`` — spec-
compatible event files, crc-checked round-trip tested): importing
``torch.utils.tensorboard`` costs ~15-20 s of process start-up, which the
r3 init-phase profile showed was the largest single init cost after host
param init.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = True):
        self.history: Dict[str, List[Tuple[int, float]]] = defaultdict(list)
        self._writer = None
        if log_dir and use_tensorboard:
            try:
                from vitsom_tpu.utils.tb_writer import EventFileWriter

                self._writer = EventFileWriter(log_dir)
            except Exception:
                self._writer = None

    def log_scalars(self, scalars: Dict[str, float], step: int):
        for k, v in scalars.items():
            self.history[k].append((step, float(v)))
            if self._writer is not None:
                self._writer.add_scalar(k, float(v), global_step=step)

    def log_image(self, tag: str, image, step: int):
        """image: HWC float [0,1] numpy array."""
        if self._writer is not None:
            self._writer.add_image(tag, image, global_step=step, dataformats="HWC")

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
