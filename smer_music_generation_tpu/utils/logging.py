"""Logging + metrics utilities.

``logger_init`` mirrors the reference's file+console pattern
(``log.py:6-25``; ``coloredlogs`` is replaced by a plain formatter).
``MetricsLogger`` is the wandb-replacement: scalar metrics appended as
JSONL so runs are machine-readable without external services
(reference logs through ``wandb.log``, ``train.py:819-880``).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

_FORMAT = "%(asctime)s : %(levelname)s : %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


def logger_init(logfile: Optional[str] = None, append: bool = False, name: str = "smer") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.handlers = []
    logger.setLevel(logging.DEBUG)
    formatter = logging.Formatter(_FORMAT, datefmt=_DATEFMT)

    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(formatter)
    logger.addHandler(console)

    if logfile:
        os.makedirs(os.path.dirname(os.path.abspath(logfile)), exist_ok=True)
        fh = logging.FileHandler(logfile, mode="a" if append else "w")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricsLogger:
    """Append-only JSONL scalar metrics sink."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        if self._fh is None:
            return
        record = {"_time": time.time()}
        if step is not None:
            record["_step"] = int(step)
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
