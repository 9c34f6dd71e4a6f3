"""Re-probe after the stream-gate fix (delta_rule_chunk N>=128) and rg=1.

Compares against probe_train_mfu.py results (streamed inner delta):
  fwd 764 ms / delta 10.98 ms/layer / step rg=1 3060 ms = 2678 tok/s.
"""

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
    from infinitevl_tpu.train.step import sft_loss_fn
    from infinitevl_tpu.utils.benchlib import device_time_ms
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token

    cfg = infinitevl_3b()
    tc = cfg.text
    log(f"backend: {jax.default_backend()}")
    shapes = jax.eval_shape(
        lambda k: init_text_params(k, tc, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    base = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    T = 8192
    r = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T)[None, None], (3, 1, T)
        ).astype(jnp.int32),
    }
    flops_tok = decoder_flops_per_token(cfg)

    # delta layer isolated
    x = jnp.asarray(r.randn(1, T, tc.hidden_size) * 0.02, jnp.bfloat16)
    seg = jnp.ones((1, T), jnp.int32)
    li = next(i for i, t in enumerate(tc.layer_types) if t == "linear_attention")
    f_delta = jax.jit(
        lambda p, h: delta_forward(p, tc, h, None, None, None, None, seg)[0]
    )
    t0 = time.time()
    ms = device_time_ms(
        lambda c: (f_delta(c[1], c[0]), c[1]), (x, base["layers"][li]),
        n1=3, n2=13,
    )
    log(f"delta fwd @8K vectorized: {ms:.2f} ms/layer (was 10.98 streamed) "
        f"[{time.time()-t0:.0f}s]")

    # forward-only
    fwd = jax.jit(
        lambda p, b: sft_loss_fn(
            p, tc, b["input_ids"], b["labels"], b["position_ids"],
            b["segment_ids"],
        )
    )

    def fstep(carry):
        acc, p, b = carry
        return (acc + fwd(p, b), p, b)

    t0 = time.time()
    ms_f = device_time_ms(
        fstep, (jnp.zeros((), jnp.float32), base, batch), n1=2, n2=8
    )
    log(f"fwd-only: {ms_f:.0f} ms (was 764); "
        f"{100*T*flops_tok/197e12*1e3/ms_f:.0f}% fwd MFU [{time.time()-t0:.0f}s]")

    # full step rg=1
    tx = optax.adamw(1e-4)
    lora = init_lora(base, jax.random.PRNGKey(1))
    opt_state = tx.init(lora)
    step_fn = jax.jit(
        make_lora_sft_step(tc, tx, remat=True, remat_group=1),
        donate_argnums=(0, 1),
    )

    def tstep(carry):
        l, o = carry
        l, o, _ = step_fn(l, o, base, batch)
        return (l, o)

    t0 = time.time()
    ms_s = device_time_ms(tstep, (lora, opt_state), n1=2, n2=6)
    log(f"step rg=1: {ms_s:.0f} ms = {T/ms_s*1000:.0f} tok/s (was 3060 = "
        f"2678), ~{100*3*T*flops_tok/197e12*1e3/ms_s:.0f}% MFU "
        f"[{time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
