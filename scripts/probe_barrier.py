"""Probe: python-layer-loop LoRA train step with remat_barrier at 16K/32K.

Context (ROUND3_NOTES): the python layer loop lets XLA hoist every layer's
remat recompute — 17.9-20.2 GB plateau at 3B/32K for ANY remat_group, and
16K still OOMs at 18.8 GB. Scan-over-layers fixed memory (13.6 GB) but the
HLO loop costs throughput (8K: 4294 loop vs ~2360 scanned tok/s; 16K/32K
ride the scan at ~2950). barrier_remat (utils/remat.py) ties each layer's
recompute to its cotangent with lax.optimization_barrier — if the
scheduler honors it, the loop should drop to scan-class memory while
keeping loop-class speed.

Grid: (T, remat_group, barrier) with memory accounting first; step timing
only when the compiler says it fits.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(T, rg, barrier):
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_text_params
    from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
    from infinitevl_tpu.utils.benchlib import device_time_ms
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token

    cfg = infinitevl_3b()
    tc = cfg.text
    shapes = jax.eval_shape(
        lambda k: init_text_params(k, tc, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    base = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    lora = init_lora(base, jax.random.PRNGKey(1))
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
        make_lora_sft_step(
            tc, tx, remat=True, remat_group=rg, remat_barrier=barrier
        ),
        donate_argnums=(0, 1),
    )
    t0 = time.time()
    compiled = step_fn.lower(lora, opt_state, base, batch).compile()
    mem = compiled.memory_analysis()
    total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes) / 1e9
    log(
        f"T={T} rg={rg} barrier={barrier}: temp "
        f"{mem.temp_size_in_bytes/1e9:.2f} + args "
        f"{mem.argument_size_in_bytes/1e9:.2f} = {total:.1f} GB "
        f"[compile {time.time()-t0:.0f}s]"
    )
    if total > 15.2:
        log(f"  -> likely OOM on 16 GB; skipping run")
        return

    def tstep(carry):
        l, o = carry
        l, o, _ = step_fn(l, o, base, batch)
        return (l, o)

    t0 = time.time()
    ms = device_time_ms(tstep, (lora, opt_state), n1=1, n2=4)
    flops_tok = decoder_flops_per_token(cfg)
    log(
        f"  step: {ms:.0f} ms = {T/ms*1000:.0f} tok/s, "
        f"~{100*3*T*flops_tok/197e12*1e3/ms:.0f}% MFU [{time.time()-t0:.0f}s]"
    )


def main():
    log(f"backend: {jax.default_backend()}")
    grid = [(16384, 1, True), (32768, 1, True)]
    if os.environ.get("PROBE_BARRIER_8K"):
        # does the barrier cost throughput where memory already fits?
        grid = [(8192, 1, True), (8192, 1, False)]
    if os.environ.get("PROBE_BARRIER_RG"):
        grid += [(32768, 2, True), (32768, 3, True)]
    for T, rg, barrier in grid:
        try:
            run(T, rg, barrier)
        except Exception as e:  # noqa: BLE001
            log(f"T={T} rg={rg} b={barrier}: FAILED {type(e).__name__}: "
                f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
