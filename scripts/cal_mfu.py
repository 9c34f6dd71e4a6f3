"""MFU calculator: measured (or given) training tok/s -> model FLOPs
utilization on v5e.

TPU-native analogue of scripts/stat_utils/cal_mfu.py in the reference
(which launches a torch train run and divides by A100 peak): pass
--tokens_per_sec from a training log, or let it slope-time one LoRA@8K
step on the attached chip (the bench.py recipe).

Usage:
  python scripts/cal_mfu.py --tokens_per_sec 4294
  python scripts/cal_mfu.py --measure            # runs one step on TPU
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens_per_sec", type=float, default=None)
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--seq_length", type=int, default=8192)
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="bf16 peak of the target chip (v5e: 197)")
    ap.add_argument("--include_backward", action="store_true", default=True)
    args = ap.parse_args()

    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token

    cfg = infinitevl_3b()
    tok_s = args.tokens_per_sec
    if tok_s is None and args.measure:
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from infinitevl_tpu.models.params import init_text_params
        from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
        from infinitevl_tpu.utils.benchlib import device_time_ms

        T = args.seq_length
        shapes = jax.eval_shape(
            lambda k: init_text_params(k, cfg.text, jnp.bfloat16),
            jax.random.PRNGKey(0),
        )
        base = jax.block_until_ready(
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        )
        r = np.random.RandomState(0)
        batch = {
            "input_ids": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
            "labels": jnp.asarray(r.randint(3, 1000, (1, T)), jnp.int32),
            "segment_ids": jnp.ones((1, T), jnp.int32),
            "position_ids": jnp.broadcast_to(
                jnp.arange(T)[None, None], (3, 1, T)
            ).astype(jnp.int32),
        }
        tx = optax.adamw(1e-4)
        lora = init_lora(base, jax.random.PRNGKey(1))
        opt_state = tx.init(lora)
        step_fn = jax.jit(
            make_lora_sft_step(cfg.text, tx, remat=True, remat_group=1),
            donate_argnums=(0, 1),
        )

        def tstep(carry):
            l, o = carry
            l, o, _ = step_fn(l, o, base, batch)
            return (l, o)

        ms = device_time_ms(tstep, (lora, opt_state), n1=2, n2=6)
        tok_s = T / ms * 1000
        print(f"measured: {ms:.0f} ms/step = {tok_s:.0f} tok/s",
              file=sys.stderr)
    if tok_s is None:
        ap.error("pass --tokens_per_sec or --measure")

    ft = decoder_flops_per_token(cfg)
    mult = 3.0 if args.include_backward else 1.0
    mfu = mult * tok_s * ft / (args.peak_tflops * 1e12)
    print(f"tok/s: {tok_s:.0f}")
    print(f"model FLOPs/token (fwd): {ft/1e9:.2f} GF, pass multiplier "
          f"{mult:g} (remat recompute excluded — useful FLOPs only)")
    print(f"MFU vs {args.peak_tflops:.0f} TFLOP/s peak: {100*mfu:.1f}%")


if __name__ == "__main__":
    main()
