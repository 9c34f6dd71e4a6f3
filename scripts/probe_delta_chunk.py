"""Probe: delta chunk_size re-sweep after the bf16-intermediates change.

The [.., C, C] tensors (kk/ratio/attn + NS solve iterates) scale linearly
with C per token; C=64 halves that traffic vs 128. Round-2 full-step sweep
showed 64 only 2% ahead; delta now dominates the step, so re-measure.
Also: does the 16K python-layer-loop path fit now (bf16 intermediates),
and is it faster than scan-over-layers' 2722 tok/s?
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


def main():
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_text_params
    from infinitevl_tpu.models.text import delta_forward
    from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
    from infinitevl_tpu.utils.benchlib import device_time_ms
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token

    cfg = infinitevl_3b()
    log(f"backend: {jax.default_backend()}")
    shapes = jax.eval_shape(
        lambda k: init_text_params(k, cfg.text, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    base = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    T = 8192
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(1, T, cfg.text.hidden_size) * 0.02, jnp.bfloat16)
    seg = jnp.ones((1, T), jnp.int32)
    li = next(
        i for i, t in enumerate(cfg.text.layer_types) if t == "linear_attention"
    )
    flops_tok = decoder_flops_per_token(cfg)

    for C in (256, 128, 64, 32):
        tc = dataclasses.replace(cfg.text, delta_chunk_size=C)
        f = jax.jit(
            lambda p, h, tc=tc: delta_forward(
                p, tc, h, None, None, None, None, seg
            )[0]
        )
        t0 = time.time()
        ms = device_time_ms(
            lambda c, f=f: (f(c[1], c[0]), c[1]), (x, base["layers"][li]),
            n1=3, n2=13,
        )
        log(f"delta fwd @8K C={C}: {ms:.2f} ms/layer [{time.time()-t0:.0f}s]")

    # full step at the sweep winner vs current default
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T)[None, None], (3, 1, T)
        ).astype(jnp.int32),
    }
    tx = optax.adamw(1e-4)
    for C in (128, 64):
        tc = dataclasses.replace(cfg.text, delta_chunk_size=C)
        lora = init_lora(base, jax.random.PRNGKey(1))
        opt_state = tx.init(lora)
        step_fn = jax.jit(
            make_lora_sft_step(tc, tx, remat=True, remat_group=1),
            donate_argnums=(0, 1),
        )

        def tstep(carry, step_fn=step_fn):
            l, o = carry
            l, o, _ = step_fn(l, o, base, batch)
            return (l, o)

        t0 = time.time()
        ms = device_time_ms(tstep, (lora, opt_state), n1=2, n2=6)
        log(f"step @8K C={C}: {ms:.0f} ms = {T/ms*1000:.0f} tok/s, "
            f"~{100*3*T*flops_tok/197e12*1e3/ms:.0f}% MFU "
            f"[{time.time()-t0:.0f}s]")
        del lora, opt_state

    # 16K python-layer-loop (no scan) memory + speed vs scan's 2722 tok/s
    T2 = 16384
    batch2 = {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T2)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T2)), jnp.int32),
        "segment_ids": jnp.ones((1, T2), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T2)[None, None], (3, 1, T2)
        ).astype(jnp.int32),
    }
    lora = init_lora(base, jax.random.PRNGKey(1))
    opt_state = tx.init(lora)
    step_fn = jax.jit(
        make_lora_sft_step(cfg.text, tx, remat=True, remat_group=1),
        donate_argnums=(0, 1),
    )
    try:
        t0 = time.time()
        lowered = step_fn.lower(lora, opt_state, base, batch2)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        tot = (mem.temp_size_in_bytes + mem.argument_size_in_bytes) / 1e9
        log(f"16K python-loop: temp {mem.temp_size_in_bytes/1e9:.2f} + args "
            f"{mem.argument_size_in_bytes/1e9:.2f} = {tot:.1f} GB "
            f"[compile {time.time()-t0:.0f}s]")
        if tot <= 15.2:
            def tstep2(carry):
                l, o = carry
                l, o, _ = step_fn(l, o, base, batch2)
                return (l, o)

            ms = device_time_ms(tstep2, (lora, opt_state), n1=1, n2=4)
            log(f"16K python-loop step: {ms:.0f} ms = {T2/ms*1000:.0f} tok/s "
                f"(scan was 2722)")
        else:
            log("  -> would OOM; scan stays the 16K path")
    except Exception as e:  # noqa: BLE001
        log(f"16K python-loop: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
