"""Probe: full 3B decode @500K with the fused Pallas int4 kernel.

Whole-graph differential (sub-part microbenchmarks are dispatch noise
through the relay): B=1 decode step with
  a) int8 + embed_q8            (the serving default)
  b) int4 G=1 + embed_q8, XLA   (dual-plane dots re-read the packed table)
  c) int4 G=1 + embed_q8, FUSED (ops/int4_pallas.py — single packed read)
Floor for (c): ~1.4 GB projections + 0.31 embed + 0.27 state r/w
= ~2.0 GB -> ~2.5 ms/tok if the unpack stays off the critical path.

SUPERSEDED by scripts/probe_decode_matrix.py (same rungs plus bf16/int8,
one process, median slopes — this script predates the min-slope-estimator
fix and its early numbers were timing fiction; the matrix verdict is
int8 5.80 / int4-XLA 10.62 / int4-FUSED 12.61 ms/tok).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

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
    from infinitevl_tpu.models.quant import prefer_fused_int4

    log(f"backend: {jax.default_backend()}")
    cfg = infinitevl_3b()
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    q4 = jax.block_until_ready(
        quantize_params(
            params, bits=4, group_size=1 << 30, quantize_embed=True
        )
    )
    del params
    ms_xla = measure(q4, cfg, 1, "int4 G=1 + embed_q8, XLA")
    q4f = prefer_fused_int4(q4)
    n_fused = sum(
        1 for p in jax.tree_util.tree_leaves_with_path(q4f)
        if "kernel_q4f" in str(p[0])
    )
    log(f"fused nodes: {n_fused}")
    ms_fused = measure(q4f, cfg, 1, "int4 G=1 + embed_q8, FUSED")
    ms_fused8 = measure(q4f, cfg, 8, "int4 G=1 + embed_q8, FUSED")
    log(f"\nfused vs XLA int4: {ms_xla:.2f} -> {ms_fused:.2f} ms/tok")


if __name__ == "__main__":
    main()
