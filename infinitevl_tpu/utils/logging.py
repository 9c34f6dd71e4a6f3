"""Logging / observability: process logger, JSONL trainer log, loss plots.

Covers the reference's extras/logging.py (rank-0 logger), LogCallback's
trainer_log.jsonl (train/callbacks.py:173), and extras/ploting.py loss
curves. W&B/SwanLab reporters are out-of-scope offline; the JSONL log is the
durable record."""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict

import jax


def get_logger(name: str = "infinitevl_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter("[%(asctime)s] %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


def is_main_process() -> bool:
    return jax.process_index() == 0


class TrainerLog:
    """Append-only JSONL metrics log + optional loss plot."""

    def __init__(self, output_dir: str, filename: str = "trainer_log.jsonl"):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self._t0 = time.time()
        self.records: list[Dict[str, Any]] = []

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"current_steps": step, "elapsed_s": round(time.time() - self._t0, 2)}
        rec.update(
            {k: (float(v) if hasattr(v, "item") or isinstance(v, float) else v)
             for k, v in metrics.items()}
        )
        self.records.append(rec)
        if is_main_process():
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def plot_loss(self, key: str = "loss", filename: str = "training_loss.png"):
        """Save a loss curve (extras/ploting.py:69 equivalent)."""
        steps = [r["current_steps"] for r in self.records if key in r]
        vals = [r[key] for r in self.records if key in r]
        if not steps:
            return None
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(7, 4))
            ax.plot(steps, vals)
            ax.set_xlabel("step")
            ax.set_ylabel(key)
            ax.set_title(f"training {key}")
            out = os.path.join(self.output_dir, filename)
            fig.savefig(out, dpi=100, bbox_inches="tight")
            plt.close(fig)
            return out
        except ImportError:
            return None


def calculate_tps(num_tokens: int, elapsed_s: float, num_devices: int = 1) -> float:
    """Effective tokens/sec (extras/misc.py calculate_tps equivalent)."""
    return num_tokens / max(elapsed_s, 1e-9)
