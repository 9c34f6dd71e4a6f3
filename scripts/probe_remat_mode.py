"""Measure text_forward remat_mode variants (r5 MFU fix candidate).

probe_mfu_attrib attributed the 31% long-context MFU to a ~1x-forward
residual beyond ideal remat (B - 4A = +19% of the step at 16K AND 32K).
Structural cause: the round-4 stacked path checkpointed THREE nested
levels — scan body, each layer inside the body, and the chunk bodies
inside each seq-chunked layer — so the backward replays the forward more
than once. This probe measures the full LoRA train step (bench-identical
recipe, zero weights passed as ARGS) for each remat_mode at 16K/32K:

  nested — round-4 behavior (body + layer + chunk checkpoints)
  scan   — body + chunk only (drops the per-layer replay)
  layer  — layer + chunk only (drops the body replay; period x boundary
           memory)
  none   — chunk checkpoints only (cheapest recompute, biggest residuals;
           expected to fit 16K, not 32K)

Run: python scripts/probe_remat_mode.py [T ...]
"""

import gc
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from infinitevl_tpu import infinitevl_3b
from infinitevl_tpu.models.params import init_text_params
from infinitevl_tpu.models.stacked import detect_period, stack_layer_params
from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
from infinitevl_tpu.utils.benchlib import device_time_ms
from infinitevl_tpu.utils.profiling import decoder_flops_per_token

PEAK = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(T):
    r = np.random.RandomState(0)
    return {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T)[None, None], (3, 1, T)
        ).astype(jnp.int32),
    }


def main():
    cfg = infinitevl_3b()
    F_tok = decoder_flops_per_token(cfg)
    log(f"devices: {jax.devices()}")

    tshapes = jax.eval_shape(
        lambda k: init_text_params(k, cfg.text, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    base = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tshapes)
    )
    lora = init_lora(base, jax.random.PRNGKey(1))
    if os.environ.get("IVL_PROBE_INT8", "0") == "1":
        # the bench 64K QLoRA recipe: int8 frozen base frees ~3.1 GB
        from infinitevl_tpu.models.quant import quantize_params

        base = jax.block_until_ready(quantize_params(base))
        log("int8 frozen base")
    period = detect_period(cfg.text.layer_types)
    base_s = stack_layer_params(base, period)
    lora_s = stack_layer_params(lora, period)
    del base, lora
    gc.collect()
    tx = optax.adamw(1e-4)

    for T in [int(a) for a in sys.argv[1:]] or (16384, 32768):
        batch = make_batch(T)
        modes = tuple(
            m for m in os.environ.get(
                "IVL_PROBE_MODES", "nested,scan,layer,none"
            ).split(",") if m
        )
        for mode in modes:
            step = jax.jit(
                make_lora_sft_step(
                    cfg.text, tx, remat=True, remat_group=1, remat_mode=mode
                ),
                donate_argnums=(0, 1),
            )
            lcur = jax.tree.map(jnp.copy, lora_s)
            opt = tx.init(lcur)

            def bstep(carry):
                l, o = carry
                l, o, _ = step(l, o, base_s, batch)
                return (l, o)

            t0 = time.time()
            log(f"[T={T}] {mode}: compile+first-step...")
            try:
                ms = device_time_ms(bstep, (lcur, opt), n1=1, n2=4)
            except Exception as e:  # noqa: BLE001 - OOM expected for some
                log(f"[T={T}] {mode}: FAILED "
                    f"({type(e).__name__}: {str(e)[:140]})")
                del step, lcur, opt
                gc.collect()
                continue
            tok_s = T / ms * 1e3
            mfu = 3.0 * tok_s * F_tok / PEAK
            log(f"[T={T}] {mode}: {ms:.0f} ms = {tok_s:.0f} tok/s, "
                f"MFU {100*mfu:.1f}% ({time.time()-t0:.0f}s)")
            del step, lcur, opt
            gc.collect()


if __name__ == "__main__":
    main()
