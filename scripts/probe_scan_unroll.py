"""Probe: scan-over-layers partial unroll at 16K/32K (round-4 queue #2).

The HLO layer loop serializes remat recomputes (the reason 16K+ fits one
v5e: 13.5-13.6 GB) but costs ~30% throughput vs the python layer loop
(2949 vs 4294 tok/s-scaled at 8K). `lax.scan(unroll=k)` inlines k bodies
per iteration: the scheduler can overlap within a k-group while memory
grows by ~k bodies' residuals. This measures the compiler's HBM accounting
and real step time for unroll in {1, 2, 3} at T=32768 and 16384.
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(T, unroll):
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_text_params
    from infinitevl_tpu.models.stacked import detect_period, stack_layer_params
    from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
    from infinitevl_tpu.utils.benchlib import device_time_ms
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token

    cfg = infinitevl_3b()
    tc = dataclasses.replace(cfg.text, delta_seq_chunk_eval=4096)
    shapes = jax.eval_shape(
        lambda k: init_text_params(k, tc, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    base = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    lora = init_lora(base, jax.random.PRNGKey(1))
    period = detect_period(tc.layer_types)
    base = stack_layer_params(base, period)
    lora = stack_layer_params(lora, period)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)
    r = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T)[None, None], (3, 1, T)
        ).astype(jnp.int32),
    }
    step_fn = jax.jit(
        make_lora_sft_step(tc, tx, remat=True, remat_group=1,
                           scan_unroll=unroll),
        donate_argnums=(0, 1),
    )
    t0 = time.time()
    compiled = step_fn.lower(lora, opt_state, base, batch).compile()
    mem = compiled.memory_analysis()
    total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes) / 1e9
    log(f"T={T} unroll={unroll}: temp {mem.temp_size_in_bytes / 1e9:.2f} GB"
        f" + args {mem.argument_size_in_bytes / 1e9:.2f} GB = {total:.1f}"
        f" [compile {time.time() - t0:.0f}s]")
    if total > 15.2:
        log(f"  -> {total:.1f} GB likely OOM on 16 GB; skipping run")
        return

    def tstep(carry):
        l, o = carry
        l, o, _ = step_fn(l, o, base, batch)
        return (l, o)

    t0 = time.time()
    ms = device_time_ms(tstep, (lora, opt_state), n1=1, n2=4)
    flops_tok = decoder_flops_per_token(infinitevl_3b())
    log(f"  step: {ms:.0f} ms = {T / ms * 1000:.0f} tok/s, "
        f"~{100 * 3 * T * flops_tok / 197e12 * 1e3 / ms:.0f}% MFU "
        f"[{time.time() - t0:.0f}s]")


def main():
    log(f"backend: {jax.default_backend()}")
    for T in (32768, 16384):
        for unroll in (2, 3):
            try:
                run(T, unroll)
            except Exception as e:  # noqa: BLE001
                log(f"T={T} unroll={unroll}: FAILED "
                    f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
