"""Metric writers: TensorBoard (if available) + JSONL fallback.

Covers the reference's TB channels (SURVEY.md §5): per-step loss scalars
(step.py:21-23), per-epoch means (step.py:30-34), parameter histograms
(step.py:39-41), LR monitor (run.py:106), val_loss, test metrics incl.
per-class AP (step.py:119-124), and image panels (step.py:152-158).
Log root layout: log_dir/<dataset>/<model> (run.py:85-86).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricWriter:
    """TensorBoard writer with a JSONL mirror (always written)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int):
        if self._tb:
            self._tb.add_scalar(tag, float(value), step)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "tag": tag, "value": float(value),
             "step": int(step)}) + "\n")

    def scalars(self, prefix: str, values: Dict[str, float], step: int):
        for k, v in values.items():
            self.scalar(f"{prefix}/{k}", v, step)

    def histogram(self, tag: str, values: np.ndarray, step: int):
        if self._tb:
            self._tb.add_histogram(tag, np.asarray(values), step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        if self._tb:
            self._tb.add_image(tag, np.asarray(img_hwc), step,
                               dataformats="HWC")

    def text(self, tag: str, content: str, step: int = 0):
        if self._tb:
            self._tb.add_text(tag, f"```\n{content}\n```", step)

    def flush(self):
        self._jsonl.flush()
        if self._tb:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb:
            self._tb.close()


def log_param_histograms(writer: MetricWriter, params, step: int,
                         max_tensors: Optional[int] = None):
    """Per-parameter histograms each epoch (step.py:39-41)."""
    import jax
    leaves = jax.tree_util.tree_leaves_with_path(params)
    if max_tensors:
        leaves = leaves[:max_tensors]
    for path, leaf in leaves:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        writer.histogram(name, np.asarray(leaf), step)
