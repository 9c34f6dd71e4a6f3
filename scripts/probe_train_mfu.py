"""Probe: where does the 8K LoRA train-step time go? (one v5e)

Measures at 3B text dims, T=8192, B=1:
  1. forward-only loss                          -> F ms
  2. full LoRA step, remat rg in {1, 6, 12}     -> expect ~4F when
     recompute-bound (fwd + recompute + bwd)
  3. full LoRA step, remat=False (if it fits)   -> expect ~3F
  4. isolated layer forwards at T=8192: delta vs swa vs mlp
     (params as carried args — never baked jit constants)

Prints stderr lines; no JSON (not a driver metric).
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
    base = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    base = jax.block_until_ready(base)

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
    log(f"fwd flops/token {flops_tok/1e9:.2f} GF -> fwd roofline "
        f"{T*flops_tok/197e12*1e3:.0f} ms at 100% MFU")

    # 1. forward-only loss (accumulator chaining: each step's loss adds to
    # the carried scalar, so the final D2H forces every dispatched step)
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
    log(f"1. forward-only: {ms_f:.0f} ms ({T/ms_f*1000:.0f} tok/s fwd; "
        f"{100*T*flops_tok/197e12*1e3/ms_f:.0f}% fwd MFU) "
        f"[{time.time()-t0:.0f}s]")

    # 2/3. full LoRA step across remat policies
    tx = optax.adamw(1e-4)
    for remat, rg in ((True, 1), (True, 6), (True, 12), (False, 1)):
        try:
            lora = init_lora(base, jax.random.PRNGKey(1))
            opt_state = tx.init(lora)
            step_fn = jax.jit(
                make_lora_sft_step(tc, tx, remat=remat, remat_group=rg),
                donate_argnums=(0, 1),
            )

            def tstep(carry, step_fn=step_fn):
                l, o = carry
                l, o, _ = step_fn(l, o, base, batch)
                return (l, o)

            t0 = time.time()
            ms = device_time_ms(tstep, (lora, opt_state), n1=2, n2=6)
            log(f"2. step remat={remat} rg={rg}: {ms:.0f} ms = "
                f"{T/ms*1000:.0f} tok/s, "
                f"~{100*3*T*flops_tok/197e12*1e3/ms:.0f}% MFU "
                f"[{time.time()-t0:.0f}s]")
            del lora, opt_state
        except Exception as e:  # noqa: BLE001
            log(f"2. step remat={remat} rg={rg}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")

    # 4. isolated layer forwards at T=8192
    from infinitevl_tpu.models.text import (
        delta_forward, mlp_forward, swa_attention_forward,
    )
    from infinitevl_tpu.ops.rope import mrope_cos_sin

    x = jnp.asarray(r.randn(1, T, tc.hidden_size) * 0.02, jnp.bfloat16)
    seg = jnp.ones((1, T), jnp.int32)
    cos, sin = mrope_cos_sin(
        batch["position_ids"], base["inv_freq"], tc.mrope_section
    )
    li_delta = next(
        i for i, t in enumerate(tc.layer_types) if t == "linear_attention"
    )
    li_swa = next(
        i for i, t in enumerate(tc.layer_types) if t == "sliding_attention"
    )
    lp_delta = base["layers"][li_delta]
    lp_swa = base["layers"][li_swa]

    f_delta = jax.jit(
        lambda p, h: delta_forward(
            p, tc, h, None, None, None, None, seg
        )[0]
    )
    f_swa = jax.jit(
        lambda p, h, c, s: swa_attention_forward(
            p, tc, h, c, s, None, None, None, segment_ids=seg
        )[0]
    )
    f_mlp = jax.jit(lambda p, h: mlp_forward(p["mlp"], h))
    n_delta = sum(1 for t in tc.layer_types if t == "linear_attention")
    n_swa = len(tc.layer_types) - n_delta
    mult = {"delta": n_delta, "swa": n_swa, "mlp": len(tc.layer_types)}
    for name, p, f in (
        ("delta", lp_delta, lambda c: (f_delta(c[1], c[0]), c[1])),
        ("swa", lp_swa, lambda c: (f_swa(c[1], c[0], cos, sin), c[1])),
        ("mlp", lp_swa, lambda c: (f_mlp(c[1], c[0]), c[1])),
    ):
        try:
            t0 = time.time()
            ms = device_time_ms(f, (x, p), n1=3, n2=13)
            log(f"4. {name} fwd @8K: {ms:.2f} ms/layer x {mult[name]} "
                f"layers = {ms*mult[name]:.0f} ms stack "
                f"[{time.time()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            log(f"4. {name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
