"""Probe: bf16 decode after the tied-lm_head transpose fix.

scripts/probe_embed_quant.py exposed that `hidden @ embed.T` materialized
the transposed 622 MB table in HBM every decode step (~2.4 ms of the B=1
step). models/text.lm_head now contracts against the table directly via
dot_general. This measures bf16 B=1 and B=8 decode @500K with the fix
(round-3 baselines: 10.59 ms B=1, 12.71 ms B=8).
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from infinitevl_tpu.config import infinitevl_3b
from infinitevl_tpu.generation import decode_step
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.models.state import init_decoder_state
from infinitevl_tpu.utils.benchlib import device_time_ms_min


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
    for B in (1, 8):
        tok = jnp.zeros((B, 1), jnp.int32)
        delta = jnp.zeros((B, 1), jnp.int32)
        state = init_decoder_state(cfg.text, B, dtype=jnp.bfloat16)
        state["cum_len"] = jnp.asarray(500_000 + 7, jnp.int32)

        def dstep(carry):
            t, s = carry
            logits, s = decode_step(params, cfg, t, delta, s)
            return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

        ms = device_time_ms_min(dstep, (tok, state), n1=5, n2=25)
        log(f"bf16 B={B} @500K: {ms:.2f} ms/step = {B*1000/ms:.1f} tok/s")
        del state


if __name__ == "__main__":
    main()
