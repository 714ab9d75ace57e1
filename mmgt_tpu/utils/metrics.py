"""Training metrics logging (replaces the reference's mlflow/wandb/loss.txt
triple, SURVEY §5.5) — a dependency-free JSONL logger with console echo.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, out_dir: str, name: str = "metrics", echo_every: int = 50):
        self.path = Path(out_dir) / f"{name}.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")
        self.echo_every = echo_every
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any], echo: Optional[bool] = None):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if echo or (echo is None and step % self.echo_every == 0):
            kv = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in rec.items() if k != "time")
            print(f"[{rec['time']:.0f}s] {kv}", file=sys.stderr)

    def close(self):
        self._fh.close()
