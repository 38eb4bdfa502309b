"""Logging / stats persistence utilities.

Covers the reference's logging surface (SURVEY.md §5): per-run file logging
(src/utils/utils.py:230-236), master-only suppression on multi-host
(mvit/utils/logging.py:38-54 — here: only jax.process_index()==0 logs),
the pickle `Logger` (utils.py:151-164), and pandas `PD_Stats`
(decar-v2/utils.py:349-372 — JSON-lines instead of pickled DataFrames;
same append-and-persist contract).
"""
from __future__ import annotations

import json
import logging
import os
import pickle


def get_logger(log_dir: str, name: str = "audiossl_tpu", master_only: bool = True) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    is_master = True
    try:
        import jax

        is_master = jax.process_index() == 0
    except Exception:
        pass
    if master_only and not is_master:
        logger.addHandler(logging.NullHandler())
        logger.propagate = False
        return logger
    os.makedirs(log_dir, exist_ok=True)
    fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
    fh.setLevel(logging.INFO)
    logger.addHandler(fh)
    return logger


class PickleLogger:
    """Append-and-persist training trace (reference `Logger`)."""

    def __init__(self, path: str):
        self.path = path
        self.data: list = []

    def log(self, point) -> None:
        self.data.append(point)
        with open(self.path, "wb") as fp:
            pickle.dump(self.data, fp, -1)

    @staticmethod
    def load(path: str) -> list:
        with open(path, "rb") as fp:
            return pickle.load(fp)


class JsonStats:
    """PD_Stats equivalent: append rows to a JSON-lines file, resumable."""

    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns
        self.rows: list[dict] = []
        if os.path.isfile(path):
            with open(path) as f:
                self.rows = [json.loads(line) for line in f if line.strip()]

    def update(self, row, save: bool = True) -> None:
        rec = dict(zip(self.columns, row)) if not isinstance(row, dict) else row
        self.rows.append(rec)
        if save:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
