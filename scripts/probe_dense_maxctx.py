"""Probe: MEASURED vs-dense speedup at the largest dense-feasible context.

Round-3 verdict weak #1: the >3.6x north star (reference README.md:49) was
supported at >=96K only by a KV-slope extrapolation. This probe finds the
largest context L where the bf16 FA2-dense twin (every layer full attention
over an L-entry KV cache) physically fits one v5e alongside its bf16
weights, slope-times dense decode there, and measures InfiniteVL bf16 and
int8-served decode at the SAME context (InfiniteVL's step is
context-independent; cum_len only enters the position masks).

Output: dense_max_ctx, ms_dense@L, ms_hybrid bf16/int8 @L, measured ratios.
bench.py's dense section is updated with the discovered L afterwards.
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.generation import decode_step
    from infinitevl_tpu.models.params import init_params
    from infinitevl_tpu.models.quant import quantize_params
    from infinitevl_tpu.models.state import init_decoder_state, state_bytes
    from infinitevl_tpu.utils.benchlib import device_time_ms

    cfg = infinitevl_3b()
    log(f"backend: {jax.default_backend()}")

    # --- dense twin first (the big allocation; hybrid comes after) ---
    def dense_cfg_at(L):
        dt = dataclasses.replace(
            cfg.text,
            layer_types=("sliding_attention",) * cfg.text.num_hidden_layers,
            sliding_window=L,
        )
        return dataclasses.replace(cfg, text=dt)

    dshapes = jax.eval_shape(
        lambda k: init_params(k, dense_cfg_at(8192), jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    wbytes = sum(
        int(np.prod(s.shape)) * s.dtype.itemsize for s in jax.tree.leaves(dshapes)
    )
    kv_per_tok = (
        cfg.text.num_hidden_layers
        * 2
        * cfg.text.num_key_value_heads
        * cfg.text.head_dim
        * 2
    )
    log(f"dense weights: {wbytes/1e9:.2f} GB, KV: {kv_per_tok} B/token")
    # usable HBM observed in prior rounds: >=15.1 GB ran; leave temp slack
    est = int((15.4e9 - wbytes) / kv_per_tok)
    log(f"estimated max ctx ~{est/1024:.0f}K")

    dparams = jax.block_until_ready(
        jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), jax.tree.map(lambda s: s, dshapes)
        )
    )

    tok = jnp.zeros((1, 1), jnp.int32)
    delta = jnp.zeros((1, 1), jnp.int32)

    # candidate ladder: multiples of 16384 descending from the estimate
    cands = []
    L = (est // 16384) * 16384
    while L >= 131072:
        cands.append(L)
        L -= 16384
    log(f"candidates: {[c//1024 for c in cands]}K")

    ms_dense = None
    L_max = None
    for L in cands:
        dcfg = dense_cfg_at(L)
        try:
            t0 = time.time()
            dstate = init_decoder_state(dcfg.text, 1, dtype=jnp.bfloat16)
            dstate["cum_len"] = jnp.asarray(L + 7, jnp.int32)
            kv_gb = state_bytes(dstate) / 1e9

            def dense_step(carry, _c=dcfg):
                t, s = carry
                logits, s = decode_step(dparams, _c, t, delta, s)
                return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

            ms = device_time_ms(dense_step, (tok, dstate), n1=3, n2=13)
            log(
                f"dense @{L//1024}K: {ms:.2f} ms/tok (KV {kv_gb:.2f} GB, "
                f"total {(wbytes/1e9)+kv_gb:.1f} GB) "
                f"[{time.time()-t0:.0f}s]"
            )
            ms_dense, L_max = ms, L
            del dstate
            break
        except Exception as e:  # noqa: BLE001 - OOM walk-down
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower():
                log(f"dense @{L//1024}K: OOM ({msg[:120]})")
                try:
                    del dstate
                except NameError:
                    pass
                continue
            raise
    if L_max is None:
        log("no candidate fit; aborting")
        return
    del dparams
    import gc

    gc.collect()

    # --- hybrid at the SAME context ---
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    state = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
    state["cum_len"] = jnp.asarray(L_max + 7, jnp.int32)

    def hstep(carry):
        t, s = carry
        logits, s = decode_step(params, cfg, t, delta, s)
        return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

    ms_h = device_time_ms(hstep, (tok, state), n1=3, n2=23)
    log(f"hybrid bf16 @{L_max//1024}K: {ms_h:.2f} ms/tok")

    qparams = jax.block_until_ready(quantize_params(params))
    del params
    gc.collect()
    qstate = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
    qstate["cum_len"] = jnp.asarray(L_max + 7, jnp.int32)

    def qstep(carry):
        t, s = carry
        logits, s = decode_step(qparams, cfg, t, delta, s)
        return (jnp.argmax(logits, -1).astype(jnp.int32)[:, None], s)

    ms_q = device_time_ms(qstep, (tok, qstate), n1=3, n2=23)
    log(f"hybrid int8 @{L_max//1024}K: {ms_q:.2f} ms/tok")

    log(
        f"RESULT dense_max_ctx={L_max} ms_dense={ms_dense:.3f} "
        f"ms_hybrid_bf16={ms_h:.3f} ms_hybrid_int8={ms_q:.3f} "
        f"vs_dense_bf16={ms_dense/ms_h:.3f} vs_dense_int8={ms_dense/ms_q:.3f}"
    )


if __name__ == "__main__":
    main()
