"""Probe: does an int8 frozen base let the PYTHON-LOOP LoRA path fit 16K?

Round-3 measured the 16K picture as: python layer loop = 18.8 GB (OOM, but
~40% faster per-step at 8K) vs scan-over-layers = 13.6 GB / 2959 tok/s.
The int8 base frees ~3.7 GB (7.5 bf16 -> 3.8 int8), which may drop the
loop to ~15.1 GB — just inside one v5e. If it fits, the measured
loop-vs-scan gap converts directly into 16K training throughput
(round-3 verdict "What's weak" #2; falsification is a valid outcome and
closes the 16K+ MFU question).

Compares, at T=16384, int8 frozen base, remat_group=1:
  A. python-loop step (params NOT stacked)     <- the hypothesis
  B. scan-over-layers step (stacked)           <- the control
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


T = 16384


def build():
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_text_params
    from infinitevl_tpu.models.quant import quantize_params, quantized_bytes
    from infinitevl_tpu.train.lora import init_lora

    cfg = infinitevl_3b()
    tc = cfg.text
    shapes = jax.eval_shape(
        lambda k: init_text_params(k, tc, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    base = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    lora = init_lora(base, jax.random.PRNGKey(1))
    base = jax.block_until_ready(quantize_params(base))
    log(f"int8 base: {quantized_bytes(base)/1e9:.2f} GB")
    r = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T)[None, None], (3, 1, T)
        ).astype(jnp.int32),
    }
    return cfg, tc, base, lora, batch


def run_variant(tag, tc, base, lora, batch, stacked):
    from infinitevl_tpu.models.stacked import detect_period, stack_layer_params
    from infinitevl_tpu.train.lora import make_lora_sft_step
    from infinitevl_tpu.utils.benchlib import device_time_ms

    if stacked:
        period = detect_period(tc.layer_types)
        base = stack_layer_params(base, period)
        lora = stack_layer_params(lora, period)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)
    step_fn = jax.jit(
        make_lora_sft_step(tc, tx, remat=True, remat_group=1),
        donate_argnums=(0, 1),
    )
    t0 = time.time()
    compiled = step_fn.lower(lora, opt_state, base, batch).compile()
    mem = compiled.memory_analysis()
    total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes) / 1e9
    log(
        f"{tag}: temp {mem.temp_size_in_bytes/1e9:.2f} + "
        f"args {mem.argument_size_in_bytes/1e9:.2f} = {total:.1f} GB "
        f"[compile {time.time()-t0:.0f}s]"
    )
    if total > 15.8:
        log(f"{tag}: over budget; skipping run")
        return None

    def tstep(carry):
        l, o = carry
        l, o, _ = step_fn(l, o, base, batch)
        return (l, o)

    t0 = time.time()
    ms = device_time_ms(tstep, (lora, opt_state), n1=1, n2=4)
    tps = T / ms * 1000
    log(f"{tag}: {ms:.0f} ms = {tps:.0f} tok/s [{time.time()-t0:.0f}s]")
    return tps


def main():
    log(f"backend: {jax.default_backend()}")
    cfg, tc, base, lora, batch = build()
    tps_loop = None
    try:
        # the step donates (lora, opt_state): hand each variant its own copy
        tps_loop = run_variant(
            "A python-loop", tc, base, jax.tree.map(jnp.copy, lora),
            batch, False,
        )
    except Exception as e:  # noqa: BLE001
        log(f"A python-loop FAILED: {type(e).__name__}: {str(e)[:300]}")
    tps_scan = None
    try:
        tps_scan = run_variant(
            "B scan-layers", tc, base, jax.tree.map(jnp.copy, lora),
            batch, True,
        )
    except Exception as e:  # noqa: BLE001
        log(f"B scan-layers FAILED: {type(e).__name__}: {str(e)[:300]}")
    if tps_loop and tps_scan:
        log(f"RESULT loop={tps_loop:.0f} scan={tps_scan:.0f} "
            f"ratio={tps_loop/tps_scan:.3f}")


if __name__ == "__main__":
    main()
