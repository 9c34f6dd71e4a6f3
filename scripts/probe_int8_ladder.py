"""Probe: int8 weight-only batched decode ladder vs bf16 at 500K context.

The B=1 decode floor is the weight read (int8 halves it: bench.py
decode_tok_s_int8). Batched rows amortize the weight read, so the int8
advantage should SHRINK as B grows — this probe quantifies where the
crossover sits so serve/batching.py docs can recommend when quant="int8"
actually buys throughput (round-3 queue item 5).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # PROBE_INT8_ONLY=1: drop the bf16 copy so big-B rows fit (B=32 needs
    # 4.2 GB of state; bf16 7.4 + int8 3.8 GB params together OOM it).
    int8_only = bool(os.environ.get("PROBE_INT8_ONLY"))
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.generation import decode_step
    from infinitevl_tpu.models.params import init_params
    from infinitevl_tpu.models.quant import quantize_params
    from infinitevl_tpu.models.state import init_decoder_state
    from infinitevl_tpu.utils.benchlib import device_time_ms

    cfg = infinitevl_3b()
    log(f"backend: {jax.default_backend()}")
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    qparams = jax.block_until_ready(quantize_params(params))
    if int8_only:
        del params
        ladder = [(B, "int8", None) for B in (24, 32)]
    else:
        ladder = [
            (B, tag, None) for B in (1, 8, 16, 32) for tag in ("bf16", "int8")
        ]

    for B, tag, _ in ladder:
        for tag, p in ((tag, qparams if tag == "int8" else params),):
            state = init_decoder_state(cfg.text, B, dtype=jnp.bfloat16)
            state["cum_len"] = jnp.asarray(500_000, jnp.int32)
            tok = jnp.zeros((B, 1), jnp.int32)
            delta = jnp.zeros((B, 1), jnp.int32)

            def dstep(carry, _p=p):
                t, s = carry
                logits, s = decode_step(_p, cfg, t, delta, s)
                return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

            t0 = time.time()
            ms = device_time_ms(dstep, (tok, state), n1=3, n2=23)
            log(
                f"B={B:2d} {tag}: {ms:6.2f} ms/step = {B*1000/ms:7.0f} tok/s "
                f"aggregate [{time.time()-t0:.0f}s]"
            )
            del state


if __name__ == "__main__":
    main()
