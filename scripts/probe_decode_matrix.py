"""Decode ladder in ONE process with median-of-reps timing.

Relay health drifts on minute scales (probe_timing_sanity.py), so
cross-process comparisons can lie in either direction. This measures the
full serving ladder back-to-back — bf16 (with the lm_head transpose fix),
int8, int8+embed_q8, int4-G1+embed_q8 XLA, int4-G1+embed_q8 FUSED —
B=1 @500K, all through benchlib's median slope, and prints the physical
read floor next to each.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from infinitevl_tpu.config import infinitevl_3b
from infinitevl_tpu.generation import decode_step
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.models.quant import (
    prefer_fused_int4,
    quantize_params,
    quantized_bytes,
)
from infinitevl_tpu.models.state import init_decoder_state, state_bytes
from infinitevl_tpu.utils.benchlib import device_time_ms_min


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(params, cfg, label, sbytes):
    tok = jnp.zeros((1, 1), jnp.int32)
    delta = jnp.zeros((1, 1), jnp.int32)
    state = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
    state["cum_len"] = jnp.asarray(500_000 + 7, jnp.int32)

    def dstep(carry):
        t, s = carry
        logits, s = decode_step(params, cfg, t, delta, s)
        return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

    t0 = time.time()
    ms = device_time_ms_min(dstep, (tok, state), n1=5, n2=25, reps=5)
    wbytes = quantized_bytes(params["text"])
    floor = (wbytes + 2 * sbytes) / 819e9 * 1e3
    log(
        f"{label}: {ms:.2f} ms/tok = {1000/ms:.1f} tok/s "
        f"(weights {wbytes/1e9:.2f} GB, floor {floor:.2f} ms; "
        f"{time.time()-t0:.0f}s)"
    )
    del state
    return ms


def main():
    log(f"backend: {jax.default_backend()}")
    cfg = infinitevl_3b()
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    sbytes = state_bytes(init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16))

    res = {}
    res["bf16+lmfix"] = measure(params, cfg, "bf16 (lm_head fix)", sbytes)
    q8 = jax.block_until_ready(quantize_params(params))
    res["int8"] = measure(q8, cfg, "int8", sbytes)
    del q8
    q8e = jax.block_until_ready(quantize_params(params, quantize_embed=True))
    res["int8+embed"] = measure(q8e, cfg, "int8+embed_q8", sbytes)
    del q8e
    q4 = jax.block_until_ready(
        quantize_params(params, bits=4, group_size=1 << 30, quantize_embed=True)
    )
    del params
    res["int4g1+embed (xla)"] = measure(q4, cfg, "int4-G1+embed XLA", sbytes)
    q4f = prefer_fused_int4(q4)
    del q4
    res["int4g1+embed FUSED"] = measure(q4f, cfg, "int4-G1+embed FUSED", sbytes)

    log("\nsummary (median slopes, one process):")
    for k, v in res.items():
        log(f"  {k:>20}: {v:.2f} ms/tok = {1000/v:.0f} tok/s")


if __name__ == "__main__":
    main()
