"""Probe: C=64 stream-vs-vectorized at 8K, and 32K scan-layers at C=64.

Context: C=64 at T=8192 is 128 chunks = the delta_stream_min_chunks
threshold, so the earlier C=64 numbers (8.77 ms fwd, 4294 tok/s step) ran
the STREAMED path; C=128 (9.18 / 3762) ran vectorized. Isolate the axes.
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
    from infinitevl_tpu.models.stacked import detect_period, stack_layer_params
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

    # fwd: C=64 vectorized (stream off) vs the measured 8.77 streamed
    for C, smc, tag in ((64, 0, "vec"), (64, 128, "stream")):
        tc = dataclasses.replace(
            cfg.text, delta_chunk_size=C, delta_stream_min_chunks=smc
        )
        f = jax.jit(
            lambda p, h, tc=tc: delta_forward(
                p, tc, h, None, None, None, None, seg
            )[0]
        )
        ms = device_time_ms(
            lambda c, f=f: (f(c[1], c[0]), c[1]), (x, base["layers"][li]),
            n1=3, n2=13,
        )
        log(f"delta fwd C={C} {tag}: {ms:.2f} ms/layer")

    batch = {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T)[None, None], (3, 1, T)
        ).astype(jnp.int32),
    }
    tx = optax.adamw(1e-4)
    for C, smc, tag in ((64, 0, "vec"),):
        tc = dataclasses.replace(
            cfg.text, delta_chunk_size=C, delta_stream_min_chunks=smc
        )
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
        log(f"step C={C} {tag}: {ms:.0f} ms = {T/ms*1000:.0f} tok/s "
            f"(stream was 4294) [{time.time()-t0:.0f}s]")
        del lora, opt_state

    # 32K scan-layers at C=64 (stream config default)
    T2 = 32768
    tc = dataclasses.replace(cfg.text, delta_chunk_size=64)
    shapes2 = jax.eval_shape(
        lambda k: init_text_params(k, tc, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    base2 = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes2)
    )
    lora = init_lora(base2, jax.random.PRNGKey(1))
    period = detect_period(tc.layer_types)
    base2 = stack_layer_params(base2, period)
    lora = stack_layer_params(lora, period)
    opt_state = tx.init(lora)
    batch2 = {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T2)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T2)), jnp.int32),
        "segment_ids": jnp.ones((1, T2), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T2)[None, None], (3, 1, T2)
        ).astype(jnp.int32),
    }
    step_fn = jax.jit(
        make_lora_sft_step(tc, tx, remat=True, remat_group=1),
        donate_argnums=(0, 1),
    )
    t0 = time.time()
    compiled = step_fn.lower(lora, opt_state, base2, batch2).compile()
    mem = compiled.memory_analysis()
    tot = (mem.temp_size_in_bytes + mem.argument_size_in_bytes) / 1e9
    log(f"32K scan C=64: temp {mem.temp_size_in_bytes/1e9:.2f} + args "
        f"{mem.argument_size_in_bytes/1e9:.2f} = {tot:.1f} GB "
        f"[compile {time.time()-t0:.0f}s]")
    if tot <= 15.2:
        def tstep2(carry):
            l, o = carry
            l, o, _ = step_fn(l, o, base2, batch2)
            return (l, o)

        ms = device_time_ms(tstep2, (lora, opt_state), n1=1, n2=4)
        log(f"32K scan C=64 step: {ms:.0f} ms = {T2/ms*1000:.0f} tok/s, "
            f"~{100*3*T2*flops_tok/197e12*1e3/ms:.0f}% MFU (C=128 was 2996)")


if __name__ == "__main__":
    main()
