"""Metrics logger: JSONL file + stdout.

Parity: the reference wires a PyTorch-Lightning TensorBoard logger via
conf/logger/ptl.yaml (train_app.py:27-181 hydra-instantiates it). The TPU
trainer's equivalent is dependency-free: newline-delimited json records
(step, epoch, wall time, metrics) that tensorboard/pandas/jq all ingest.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class MetricsLogger:
    """Append metric records to <dir>/metrics.jsonl and the log stream."""

    def __init__(self, log_dir: Optional[str] = None, flush_every: int = 1):
        self.log_dir = log_dir
        self.flush_every = flush_every
        self._fh = None
        self._n = 0
        self._t0 = time.time()
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        record = {
            "step": int(step),
            "wall_time": round(time.time() - self._t0, 3),
            **({"epoch": int(epoch)} if epoch is not None else {}),
            **{
                k: (float(v) if hasattr(v, "__float__") else v)
                for k, v in metrics.items()
            },
        }
        logger.info("metrics %s", record)
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._n += 1
            if self._n % self.flush_every == 0:
                self._fh.flush()
        return record

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
