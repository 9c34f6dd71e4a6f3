"""Where the long-context training MFU goes (r4 verdict weak #3 / next #3).

The 64K QLoRA step measures ~31% MFU vs 45% at 8K. This probe attributes
the gap with whole-graph DIFFERENTIAL timings (sub-part microbenchmarks are
dispatch-noise through the relay — CLAUDE.md), at T = 16K and 32K on the
scan-over-layers LoRA recipe:

  A. fwd-only loss (remat checkpoint policies only affect the backward, so
     this is exactly 1x forward FLOPs through the same scan body)
  B. full train step, remat rg=1 (fwd + full recompute + bwd + opt:
     ~4x forward matmul FLOPs, of which the MFU convention counts 3x)
  C. (16K only, python loop) full step with remat OFF: bwd/fwd efficiency
     without the recompute pass, peak memory permitting

Ledger:
  - fwd efficiency = (T/ms_A) * F_tok / peak   (the scan body's own MFU)
  - remat ceiling for the step = 3/4 * fwd efficiency (the recompute pass
    is real FLOPs the 3x-useful convention does not credit)
  - residual = ms_B - 4 * ms_A  -> scan/bwd inefficiency beyond remat
Whatever bucket dominates is where optimization effort goes; if measured
step MFU ~= remat ceiling, 31% is the remat floor and the honest fix is a
cheaper recompute (e.g. selective checkpointing), not kernel work.

Run on the real chip: python scripts/probe_mfu_attrib.py [T ...]
"""

import gc
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from infinitevl_tpu import infinitevl_3b
from infinitevl_tpu.models.params import init_text_params
from infinitevl_tpu.models.stacked import detect_period, stack_layer_params
from infinitevl_tpu.train.lora import attach_lora, init_lora, make_lora_sft_step
from infinitevl_tpu.train.step import sft_loss_fn
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
    log(f"devices: {jax.devices()}  F/tok(matmul ledger) = {F_tok/1e9:.2f} GF")

    tshapes = jax.eval_shape(
        lambda k: init_text_params(k, cfg.text, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    base = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tshapes)
    )
    lora = init_lora(base, jax.random.PRNGKey(1))
    period = detect_period(cfg.text.layer_types)
    base_s = stack_layer_params(base, period)
    lora_s = stack_layer_params(lora, period)
    # the unstacked twins pin a second full copy of the 6.2 GB text tree —
    # the first run of this probe OOMed stage B exactly because of it
    del base, lora
    gc.collect()
    tx = optax.adamw(1e-4)

    for T in [int(a) for a in sys.argv[1:]] or (16384, 32768):
        batch = make_batch(T)

        # --- A: fwd-only loss through the SAME merged scan body ---
        def fwd_loss(l, b, bt):
            merged = attach_lora(b, l, 16.0, 8, False)
            return sft_loss_fn(
                merged, cfg.text, bt["input_ids"], bt["labels"],
                bt["position_ids"], bt["segment_ids"],
                remat=True, remat_group=1,
            )

        fwd_j = jax.jit(fwd_loss)

        def astep(carry):
            (l,) = carry
            v = fwd_j(l, base_s, batch)
            # chain through a lora leaf so dispatches serialize
            lead = jax.tree.leaves(l)[0]
            l = jax.tree.map(
                lambda x: x + (v * 0).astype(x.dtype)
                if x.shape == lead.shape and x is lead else x, l,
            )
            return (l,)

        t0 = time.time()
        ms_a = device_time_ms(astep, (lora_s,), n1=2, n2=6)
        fwd_tok_s = T / ms_a * 1e3
        fwd_eff = fwd_tok_s * F_tok / PEAK
        log(f"[T={T}] A fwd-only: {ms_a:.0f} ms = {fwd_tok_s:.0f} tok/s "
            f"-> fwd efficiency {100*fwd_eff:.1f}% "
            f"(compile+measure {time.time()-t0:.0f}s)")

        # free A's executable and chained carry before B (HBM headroom)
        del fwd_j, astep
        gc.collect()

        # --- B: full remat step (bench-identical recipe) ---
        step = jax.jit(
            make_lora_sft_step(cfg.text, tx, remat=True, remat_group=1),
            donate_argnums=(0, 1),
        )
        lcur = jax.tree.map(jnp.copy, lora_s)
        opt = tx.init(lcur)

        def bstep(carry):
            l, o = carry
            l, o, _ = step(l, o, base_s, batch)
            return (l, o)

        t0 = time.time()
        try:
            ms_b = device_time_ms(bstep, (lcur, opt), n1=1, n2=4)
        except Exception as e:  # noqa: BLE001 - likely OOM
            log(f"[T={T}] B full step: FAILED "
                f"({type(e).__name__}: {str(e)[:160]})")
            del step, lcur, opt
            gc.collect()
            continue
        tok_s = T / ms_b * 1e3
        mfu = 3.0 * tok_s * F_tok / PEAK
        ceiling = 0.75 * fwd_eff
        resid = ms_b - 4 * ms_a
        log(f"[T={T}] B full step rg=1: {ms_b:.0f} ms = {tok_s:.0f} tok/s, "
            f"MFU {100*mfu:.1f}% | remat ceiling {100*ceiling:.1f}% | "
            f"residual (B - 4A) = {resid:+.0f} ms = "
            f"{100*resid/ms_b:.0f}% of the step "
            f"(compile+measure {time.time()-t0:.0f}s)")

        # --- C: remat OFF (16K only; 32K no-remat does not fit) ---
        if T <= 16384:
            try:
                step_nr = jax.jit(
                    make_lora_sft_step(cfg.text, tx, remat=False),
                    donate_argnums=(0, 1),
                )
                lc2 = jax.tree.map(jnp.copy, lora_s)
                opt2 = tx.init(lc2)

                def cstep(carry):
                    l, o = carry
                    l, o, _ = step_nr(l, o, base_s, batch)
                    return (l, o)

                t0 = time.time()
                ms_c = device_time_ms(cstep, (lc2, opt2), n1=1, n2=4)
                tok_c = T / ms_c * 1e3
                mfu_c = 3.0 * tok_c * F_tok / PEAK
                log(f"[T={T}] C no-remat step: {ms_c:.0f} ms = "
                    f"{tok_c:.0f} tok/s, MFU {100*mfu_c:.1f}% | "
                    f"bwd/fwd ratio = {(ms_c-ms_a)/ms_a:.2f} (ideal 2.0) "
                    f"({time.time()-t0:.0f}s)")
            except Exception as e:  # noqa: BLE001 - likely OOM
                log(f"[T={T}] C no-remat: skipped "
                    f"({type(e).__name__}: {str(e)[:160]})")
        del step, lcur, opt
        gc.collect()


if __name__ == "__main__":
    main()
