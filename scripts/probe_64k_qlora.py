"""Probe: 64K-context QLoRA (int8 frozen base) scan-over-layers train step.

The 32K bf16-base recipe measured 13.6 GB / 2949 tok/s (ROUND3_NOTES). At
64K the activation temp roughly doubles (~12 GB) and no longer fits next
to a 7.5 GB bf16 base; examples/sft_64k_qlora_yarn.yaml quantizes the
frozen base to int8 (~3.8 GB). This probe runs that recipe's compute core
(quantize_params -> stack -> make_lora_sft_step) with the TPU compiler's
HBM accounting first, stepping only if it fits.
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
    from infinitevl_tpu.models.quant import quantize_params, quantized_bytes
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
    base = jax.block_until_ready(quantize_params(base))
    log(f"int8 base: {quantized_bytes(base)/1e9:.2f} GB")
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
    t0 = time.time()
    compiled = step_fn.lower(lora, opt_state, base, batch).compile()
    mem = compiled.memory_analysis()
    total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes) / 1e9
    log(f"T={T} ec={eval_chunk}: temp {mem.temp_size_in_bytes/1e9:.2f} + "
        f"args {mem.argument_size_in_bytes/1e9:.2f} = {total:.1f} GB "
        f"[compile {time.time()-t0:.0f}s]")
    if total > 15.2:
        log("  -> likely OOM on 16 GB; skipping run")
        return

    def tstep(carry):
        l, o = carry
        l, o, _ = step_fn(l, o, base, batch)
        return (l, o)

    t0 = time.time()
    ms = device_time_ms(tstep, (lora, opt_state), n1=1, n2=3)
    flops_tok = decoder_flops_per_token(infinitevl_3b())
    log(f"  step: {ms:.0f} ms = {T/ms*1000:.0f} tok/s, "
        f"~{100*3*T*flops_tok/197e12*1e3/ms:.0f}% MFU [{time.time()-t0:.0f}s]")


def main():
    log(f"backend: {jax.default_backend()}")
    import os

    cfgs = [(65536, 4096)]
    if os.environ.get("PROBE_64K_EC8K"):
        cfgs += [(65536, 8192)]
    for T, ec in cfgs:
        try:
            run(T, ec)
        except Exception as e:  # noqa: BLE001
            log(f"T={T} ec={ec}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
