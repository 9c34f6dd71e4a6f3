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


def device_time_ms_min(
    step: Callable,
    init,
    n1: int = 3,
    n2: int = 13,
    warmup: int = 1,
    reps: int = 5,
) -> float:
    """MEDIAN over `reps` slope measurements, carry threaded across reps.
    (Name kept for call-site stability; the statistic changed from min to
    median — see below.)

    The relay's health varies on minute scales (observed: a window where
    per-step host cost inflated a 10.6 ms B=1 decode to a 'measured'
    19.1 ms while an 8-token verify of the SAME weights timed 11.9 ms —
    physically impossible). The first fix took the MIN across reps on the
    theory that stalls only ADD time — but a stall inside the FIRST
    window (t1-t0) SUBTRACTS from the differential slope, so the min
    prefers lying-LOW reps: probe_int4_pallas pair steps "measured"
    0.009 ms for a 90 MB weight read (10+ TB/s), and an int8+embed decode
    read 3.67 ms/tok against a 4.9 ms physical floor
    (scripts/probe_timing_sanity.py shows the rep spread). The median is
    robust to a stall in EITHER window as long as most reps are clean.

    The carry from one rep seeds the next (instead of re-passing `init`),
    so steps that DONATE their state (decode_step and friends) stay valid:
    `init`'s buffers are consumed exactly once, at warmup."""
    out = _run_chained(step, init, warmup)
    slopes = []
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        out = _run_chained(step, out, n1)
        t1 = time.perf_counter()
        out = _run_chained(step, out, n2)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    pos = sorted(s for s in slopes if s > 0) or sorted(slopes)
    return pos[len(pos) // 2]


def sync_overhead_ms() -> float:
    """Measured cost of one tiny D2H read (the relay's fixed latency)."""
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.float32)
    np.asarray(x[:1])
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(x[:1])
    return (time.perf_counter() - t0) / 5 * 1e3
