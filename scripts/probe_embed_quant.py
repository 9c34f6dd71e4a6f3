"""Probe: row-wise int8 embed/lm_head table on top of int8 projections.

The tied lm_head matmul reads the full vocab x hidden table every decoded
token — 622 MB bf16 at 3B = ~0.6-0.8 ms of the measured 6.15 ms int8 B=1
step. quantize_params(quantize_embed=True) halves that read.

Measures B=1 decode @500K ctx: int8 (round-3 serving default) vs
int8+embed_q8, plus B=8. Run on the real chip.
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
from infinitevl_tpu.models.quant import quantize_params
from infinitevl_tpu.models.state import init_decoder_state
from infinitevl_tpu.utils.benchlib import device_time_ms_min


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(params, cfg, B, label):
    tok = jnp.zeros((B, 1), jnp.int32)
    delta = jnp.zeros((B, 1), jnp.int32)
    state = init_decoder_state(cfg.text, B, dtype=jnp.bfloat16)
    state["cum_len"] = jnp.asarray(500_000 + 7, jnp.int32)

    def dstep(carry):
        t, s = carry
        logits, s = decode_step(params, cfg, t, delta, s)
        return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

    t0 = time.time()
    ms = device_time_ms_min(dstep, (tok, state), n1=5, n2=25)
    log(
        f"{label} B={B}: {ms:.2f} ms/step = {B*1000/ms:.1f} tok/s "
        f"(compile+measure {time.time()-t0:.0f}s)"
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
    q = jax.block_until_ready(quantize_params(params))
    ms_q = measure(q, cfg, 1, "int8")
    del q
    qe = jax.block_until_ready(quantize_params(params, quantize_embed=True))
    del params
    ms_qe = measure(qe, cfg, 1, "int8+embed_q8")
    ms_qe8 = measure(qe, cfg, 8, "int8+embed_q8")
    log(
        f"\nembed-quant win: {ms_q:.2f} -> {ms_qe:.2f} ms/tok "
        f"({(ms_q-ms_qe)*1000:.0f} us, {100*(ms_q/ms_qe-1):.1f}% faster)"
    )


if __name__ == "__main__":
    main()
