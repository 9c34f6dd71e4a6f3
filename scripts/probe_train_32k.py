"""Probe: 32K LoRA scan-over-layers train step after the splash-tile and
delta-bf16-intermediates fixes. Round-3 baseline: 1459 tok/s, 13.5 GB
(temp 5.96 + args 7.54) with delta_seq_chunk_eval=4096.

Also tries eval chunk 8192 (bf16 intermediates halve the seq-chunk
backward residency, so the bigger chunk may now fit and amortize better).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(T, eval_chunk):
    import dataclasses

    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_text_params
    from infinitevl_tpu.models.stacked import detect_period, stack_layer_params
    from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
    from infinitevl_tpu.utils.benchlib import device_time_ms
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token

    cfg = infinitevl_3b()
    tc = dataclasses.replace(cfg.text, delta_seq_chunk_eval=eval_chunk)
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
        make_lora_sft_step(tc, tx, remat=True, remat_group=1),
        donate_argnums=(0, 1),
    )
    # compile + memory accounting first
    t0 = time.time()
    lowered = step_fn.lower(lora, opt_state, base, batch)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    log(f"T={T} eval_chunk={eval_chunk}: temp "
        f"{mem.temp_size_in_bytes/1e9:.2f} GB + args "
        f"{mem.argument_size_in_bytes/1e9:.2f} GB + out "
        f"{mem.output_size_in_bytes/1e9:.2f} GB "
        f"[compile {time.time()-t0:.0f}s]")
    total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes) / 1e9
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
    log(f"  step: {ms:.0f} ms = {T/ms*1000:.0f} tok/s, "
        f"~{100*3*T*flops_tok/197e12*1e3/ms:.0f}% MFU [{time.time()-t0:.0f}s]")


def main():
    log(f"backend: {jax.default_backend()}")
    import os

    cfgs = ((32768, 4096), (32768, 8192), (16384, 8192))
    if os.environ.get("PROBE_32K_ONLY"):
        cfgs = ((32768, 4096), (16384, 4096))
    for T, ec in cfgs:
        try:
            run(T, ec)
        except Exception as e:  # noqa: BLE001
            log(f"T={T} ec={ec}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
