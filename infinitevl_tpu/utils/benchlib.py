"""Timing utilities that stay honest on transports with slow host<->device
sync (the axon relay charges ~70ms per D2H regardless of size).

device_time_ms() times n1 and n2 chained iterations and returns the slope
(t2 - t1) / (n2 - n1): per-iteration device time with the constant sync cost
cancelled. Iterations are chained through a data dependency so the device
cannot overlap them dishonestly.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def _run_chained(step: Callable, init, n: int):
    out = init
    for _ in range(n):
        out = step(out)
    # force completion: tiny D2H on one leaf
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    return out


def device_time_ms(
    step: Callable,
    init,
    n1: int = 3,
    n2: int = 13,
    warmup: int = 1,
) -> float:
    """Per-iteration device milliseconds for `step(state) -> state`."""
    out = _run_chained(step, init, warmup)  # compile + warm
    t0 = time.perf_counter()
    out = _run_chained(step, out, n1)
    t1 = time.perf_counter()
    out = _run_chained(step, out, n2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


def sync_overhead_ms() -> float:
    """Measured cost of one tiny D2H read (the relay's fixed latency)."""
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.float32)
    np.asarray(x[:1])
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(x[:1])
    return (time.perf_counter() - t0) / 5 * 1e3
