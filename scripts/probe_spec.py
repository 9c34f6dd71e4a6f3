"""Probe: speculative-decoding window costs on the real chip.

Speculation's speedup = (accepted+1) tokens per verify window, so the
mechanical question is what a draft_k-token `spec_verify` forward costs
relative to one `decode_step` @500K ctx. Decode is weight-read-bound
(~10.5 ms at B=1), so a K<=8 window should be ~1 step; this probe measures
the actual ratio plus the partial-acceptance `spec_commit` programs, giving
the honest throughput formula

    tok/s = 1000 * (E[accepted] + 1) / (ms_verify + p_partial * ms_commit)

without inventing an acceptance rate (that is workload-dependent; the
token-level mechanics are what the hardware fixes).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.generation import decode_step, spec_commit, spec_verify
    from infinitevl_tpu.models.params import init_params
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
    state0 = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
    state0["cum_len"] = jnp.asarray(500_000, jnp.int32)
    delta = jnp.zeros((1, 1), jnp.int32)

    def dstep(carry):
        t, s = carry
        logits, s = decode_step(params, cfg, t, delta, s)
        return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

    tok = jnp.zeros((1, 1), jnp.int32)
    t0 = time.time()
    ms_dec = device_time_ms(dstep, (tok, state0), n1=3, n2=23)
    log(f"decode_step:        {ms_dec:6.2f} ms [{time.time()-t0:.0f}s]")

    for K in (4, 8, 16):
        win = jnp.zeros((1, K), jnp.int32)
        state = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
        state["cum_len"] = jnp.asarray(500_000, jnp.int32)

        # verify is non-donating (state reused on rejection) — time the
        # full round-trip a real spec round pays: verify then re-issue.
        def vstep(carry):
            (s,) = carry
            logits, _ = spec_verify(params, cfg, win, delta, s)
            return (s,)

        t0 = time.time()
        ms_v = device_time_ms(vstep, (state,), n1=2, n2=12)
        log(
            f"spec_verify  K={K:2d}: {ms_v:6.2f} ms = {ms_v/ms_dec:.2f}x a "
            f"decode step -> full-acceptance ceiling "
            f"{K*1000/ms_v:5.0f} tok/s [{time.time()-t0:.0f}s]"
        )

    # partial-acceptance commit (donating, T=j+1): the extra program a
    # rejected round pays on top of verify
    for J in (1, 4):
        state = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
        state["cum_len"] = jnp.asarray(500_000, jnp.int32)
        winj = jnp.zeros((1, J), jnp.int32)

        def cstep(carry):
            (s,) = carry
            _, s = spec_commit(params, cfg, winj, delta, s)
            return (s,)

        t0 = time.time()
        ms_c = device_time_ms(cstep, (state,), n1=2, n2=12)
        log(f"spec_commit  T={J:2d}: {ms_c:6.2f} ms [{time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
