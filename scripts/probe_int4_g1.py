"""Probe: int4 decode latency levers (round-4 queue #1).

int4 B=1 decode measured a LATENCY LOSS vs int8 (14.9 vs 6.1 ms @500K,
ROUND3_NOTES): the nibble unpack chain + group-scale handling is VPU-bound.
Two candidate levers, each measured here as whole-graph decode steps:

- group_size >= d_in -> the int4_matmul G==1 branch: two plain dots + ONE
  column scale — the same fusion shape as int8's convert+scale-on-read,
  at a quarter of the HBM bytes.
- biased-nibble storage (kernel_q4b, q+7 in [0,14]): the unpack drops the
  two sign-fix selects, leaving mask/shift/convert/subtract.

Grid: {signed, biased} x {G=128, G=1} at B=1, plus int8 reference.
"""

import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(tag, qparams, cfg, B=1):
    from infinitevl_tpu.generation import decode_step
    from infinitevl_tpu.models.state import init_decoder_state
    from infinitevl_tpu.utils.benchlib import device_time_ms

    state = init_decoder_state(cfg.text, B, dtype=jnp.bfloat16)
    state["cum_len"] = jnp.asarray(500_000, jnp.int32)
    tok = jnp.zeros((B, 1), jnp.int32)
    delta = jnp.zeros((B, 1), jnp.int32)

    def dstep(carry):
        t, s = carry
        logits, s = decode_step(qparams, cfg, t, delta, s)
        return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

    t0 = time.time()
    ms = device_time_ms(dstep, (tok, state), n1=3, n2=23)
    log(
        f"{tag:26s} B={B}: {ms:6.2f} ms/step = {B * 1000 / ms:6.0f} tok/s"
        f"  [{time.time() - t0:.0f}s]"
    )
    return ms


def main():
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_params
    from infinitevl_tpu.models.quant import quantize_params, quantized_bytes

    cfg = infinitevl_3b()
    log(f"backend: {jax.default_backend()}")
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )

    results = {}
    for tag, kw in (
        ("int4 signed G=128", dict(bits=4)),
        ("int4 signed G=1", dict(bits=4, group_size=1 << 30)),
        ("int4 biased G=128", dict(bits=4, int4_biased=True)),
        ("int4 biased G=1", dict(bits=4, group_size=1 << 30, int4_biased=True)),
        ("int8", dict(bits=8)),
    ):
        q = jax.block_until_ready(quantize_params(params, **kw))
        log(f"{tag}: {quantized_bytes(q) / 1e9:.2f} GB")
        results[tag] = measure(tag, q, cfg)
        del q

    best = min(results, key=results.get)
    log(f"best: {best} at {results[best]:.2f} ms")


if __name__ == "__main__":
    main()
