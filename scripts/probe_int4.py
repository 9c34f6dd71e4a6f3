"""Probe: int4 nibble-packed weight-only decode on the real chip.

Two questions: (a) does the hand-packed uint8 layout actually work as a jit
ARGUMENT on the TPU PJRT backend (jnp.int4 arguments hit a device_put
recursion — see models/quant.quantize_kernel_int4), and (b) what does the
quarter-weight-read buy at the B=1 decode floor vs int8's measured
163 tok/s @500K (probe_int8_ladder results in ROUND3_NOTES).
"""

import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.generation import decode_step
    from infinitevl_tpu.models.params import init_params
    from infinitevl_tpu.models.quant import quantize_params, quantized_bytes
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
    q4 = jax.block_until_ready(quantize_params(params, bits=4))
    del params
    log(f"int4 param bytes: {quantized_bytes(q4)/1e9:.2f} GB")

    for B in (1, 8):
        state = init_decoder_state(cfg.text, B, dtype=jnp.bfloat16)
        state["cum_len"] = jnp.asarray(500_000, jnp.int32)
        tok = jnp.zeros((B, 1), jnp.int32)
        delta = jnp.zeros((B, 1), jnp.int32)

        def dstep(carry):
            t, s = carry
            logits, s = decode_step(q4, cfg, t, delta, s)
            return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

        t0 = time.time()
        ms = device_time_ms(dstep, (tok, state), n1=3, n2=23)
        log(
            f"B={B:2d} int4: {ms:6.2f} ms/step = {B*1000/ms:7.0f} tok/s "
            f"aggregate [{time.time()-t0:.0f}s]"
        )
        del state


if __name__ == "__main__":
    main()
