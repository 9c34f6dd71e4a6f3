"""Timing-estimator sanity check on the int8+embed_q8 decode step.

device_time_ms_min takes the min over chained-slope reps on the theory
that relay stalls only ADD time. But a stall inside the FIRST window
(t1-t0) SUBTRACTS from the slope — the min then prefers lying-LOW reps.
Evidence: probe_int4_pallas pair steps "measured" 0.009 ms for a 90 MB
weight read (10+ TB/s), and probe_embed_quant read 3.67 ms/tok where the
physical floor (3.42 GB int8 projections + 0.31 embed + state) is ~4.2.

This prints every rep's slope for B=1 int8+embed decode, long-window
(n1=10, n2=50) and short-window, so the distribution is visible, plus
the physical floor for reference. Decision input for whether benchlib
should report min, median, or a stall-filtered mean.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu.config import infinitevl_3b
from infinitevl_tpu.generation import decode_step
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.models.quant import quantize_params, quantized_bytes
from infinitevl_tpu.models.state import init_decoder_state, state_bytes
from infinitevl_tpu.utils.benchlib import _run_chained


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"backend: {jax.default_backend()}")
    cfg = infinitevl_3b()
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    q = jax.block_until_ready(quantize_params(params, quantize_embed=True))
    del params
    text_bytes = quantized_bytes(q["text"] if "text" in q else q)
    vis_bytes = quantized_bytes(q.get("visual", {}))
    state = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
    state["cum_len"] = jnp.asarray(500_000 + 7, jnp.int32)
    sbytes = state_bytes(state)
    floor_gb = (text_bytes - vis_bytes * 0 + 2 * sbytes) / 1e9
    log(
        f"text weights {text_bytes/1e9:.2f} GB, state {sbytes/1e6:.0f} MB "
        f"-> read floor ~{(text_bytes + 2*sbytes)/819e9*1e3:.2f} ms/tok "
        f"at 819 GB/s"
    )

    tok = jnp.zeros((1, 1), jnp.int32)
    delta = jnp.zeros((1, 1), jnp.int32)

    def dstep(carry):
        t, s = carry
        logits, s = decode_step(q, cfg, t, delta, s)
        return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

    out = _run_chained(dstep, (tok, state), 2)  # compile + warm
    for n1, n2, label in ((5, 25, "short"), (10, 50, "long")):
        slopes = []
        for _ in range(7):
            t0 = time.perf_counter()
            out = _run_chained(dstep, out, n1)
            t1 = time.perf_counter()
            out = _run_chained(dstep, out, n2)
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
        arr = np.array(slopes)
        log(
            f"{label} (n1={n1}, n2={n2}): reps "
            + " ".join(f"{s:.2f}" for s in slopes)
            + f" | min {arr.min():.2f} med {np.median(arr):.2f} "
            f"max {arr.max():.2f}"
        )
    # single long window WITHOUT differencing (includes one sync):
    # per-step upper bound from a big n
    N = 200
    t0 = time.perf_counter()
    out = _run_chained(dstep, out, N)
    t1 = time.perf_counter()
    log(f"bulk {N} steps incl one sync: {(t1-t0)/N*1e3:.2f} ms/step upper bound")


if __name__ == "__main__":
    main()
