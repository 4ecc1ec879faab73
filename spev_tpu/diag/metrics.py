"""Structured metrics logging: JSONL per run (replaces the reference's
print-only logging, ``spev_real_metrics.py:593-596``)."""

from __future__ import annotations

import json
import os
import time
from typing import List


def log_metrics(log_dir: str, step: int, metrics: dict) -> None:
    os.makedirs(log_dir, exist_ok=True)
    rec = {"step": int(step), "time": time.time()}
    rec.update({k: float(v) for k, v in metrics.items()})
    with open(os.path.join(log_dir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def read_metrics(log_dir: str) -> List[dict]:
    path = os.path.join(log_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
