"""Structured metric logging (the reference logs via print/tqdm only,
SURVEY §5).  One JSON line per event, plus stdout mirror."""

from __future__ import annotations

import json
import time
from typing import Any


class MetricLogger:
    def __init__(self, path: str):
        self.path = path

    def log(self, **kv: Any):
        kv["t"] = time.time()
        clean = {}
        for k, v in kv.items():
            if hasattr(v, "item"):
                try:
                    v = v.item()
                except Exception:
                    v = str(v)
            clean[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(clean) + "\n")
