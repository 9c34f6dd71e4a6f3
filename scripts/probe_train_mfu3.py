"""Probe: splash 1024-tile parity + full 8K LoRA step after the fixes.

Baselines: step rg=6 3706 ms (bench r2 config), rg=1 3060 ms,
fwd-only 764 ms, swa fwd 22 ms/layer.
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
    from infinitevl_tpu.ops.swa import attention_dense, sliding_window_mask, swa_prefill_dense
    from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
    from infinitevl_tpu.train.step import sft_loss_fn
    from infinitevl_tpu.utils.benchlib import device_time_ms
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token

    cfg = infinitevl_3b()
    tc = cfg.text
    log(f"backend: {jax.default_backend()}")

    # parity: splash (1024 tiles) vs dense-mask path at T=2048, window 512,
    # two packed segments
    r = np.random.RandomState(0)
    T, Hq, Hkv, D, W = 2048, 16, 2, 128, 512
    q = jnp.asarray(r.randn(1, T, Hq, D) * 0.3, jnp.bfloat16)
    k = jnp.asarray(r.randn(1, T, Hkv, D) * 0.3, jnp.bfloat16)
    v = jnp.asarray(r.randn(1, T, Hkv, D) * 0.3, jnp.bfloat16)
    seg = jnp.asarray(
        np.concatenate([np.ones(900), 2 * np.ones(T - 900)])[None], jnp.int32
    )
    out_splash = swa_prefill_dense(q, k, v, W, segment_ids=seg)  # TPU: splash
    pos = jnp.arange(T, dtype=jnp.int32)
    mask = sliding_window_mask(pos, pos, W)[None] & (
        seg[:, :, None] == seg[:, None, :]
    )
    kr = jnp.repeat(k, Hq // Hkv, axis=2)
    vr = jnp.repeat(v, Hq // Hkv, axis=2)
    out_dense = attention_dense(q, kr, vr, mask)
    err = float(
        jnp.abs(out_splash.astype(jnp.float32) - out_dense.astype(jnp.float32)).max()
        / (jnp.abs(out_dense.astype(jnp.float32)).max() + 1e-9)
    )
    log(f"splash-1024 parity vs dense (T=2048, W=512, packed): err {err:.2e}")
    assert err < 5e-2, err

    # full step
    shapes = jax.eval_shape(
        lambda kk: init_text_params(kk, tc, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    base = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    T = 8192
    batch = {
        "input_ids": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "labels": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(T)[None, None], (3, 1, T)
        ).astype(jnp.int32),
    }
    flops_tok = decoder_flops_per_token(cfg)

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
    log(f"step rg=1 + splash-1024: {ms_s:.0f} ms = {T/ms_s*1000:.0f} tok/s "
        f"(was 3060 = 2678), ~{100*3*T*flops_tok/197e12*1e3/ms_s:.0f}% MFU "
        f"[{time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
