"""Long-sequence prefill / training-step throughput (tok/s, MFU).

Counterpart of the reference's throughput accounting
(train/dt/workflow.py:133-136 effective_tokens_per_sec + stat_utils
cal_mfu). Run on the TPU:

    python scripts/prefill_bench.py --seqlen 8192 --train
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqlen", type=int, default=8192)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--train", action="store_true", help="time a train step")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_text_params
    from infinitevl_tpu.models.text import embed_tokens, text_forward
    from infinitevl_tpu.utils.benchlib import device_time_ms
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token, mfu

    cfg = infinitevl_3b()
    B, T = args.batch, args.seqlen
    shapes = jax.eval_shape(
        lambda k: init_text_params(k, cfg.text, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    ids = jnp.zeros((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))

    if args.train:
        # LoRA step: full-parameter AdamW on 3.7B needs ~30 GB of optimizer
        # state — multi-chip FSDP territory (see __graft_entry__). The
        # single-chip long-context recipe is LoRA + per-layer remat +
        # splash attention, exactly the reference's stage 3.
        from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
        from infinitevl_tpu.train.step import make_optimizer

        tx = make_optimizer(1e-4, weight_decay=0.0)
        full = {"text": params}
        lora = init_lora(full, jax.random.PRNGKey(1), rank=8)
        opt_state = tx.init(lora)
        step = jax.jit(
            make_lora_sft_step(cfg.text, tx, remat=True),
            donate_argnums=(0, 1),
        )
        batch = {"input_ids": ids, "labels": ids, "position_ids": pos}

        def fn(carry):
            lra, opt = carry
            lra, opt, loss = step(lra, opt, full, batch)
            return (lra, opt)

        ms = device_time_ms(fn, (lora, opt_state), n1=2, n2=6)
        label = "LoRA train step (remat)"
        flops_mult = 3.0  # fwd + bwd
    else:
        fwd = jax.jit(
            lambda p, e: text_forward(p, cfg.text, e, pos, None)[0]
        )

        def fn(e):
            return fwd(params, e).astype(jnp.bfloat16)

        e0 = jnp.zeros((B, T, cfg.text.hidden_size), jnp.bfloat16)
        ms = device_time_ms(fn, e0, n1=3, n2=9)
        label = "prefill"
        flops_mult = 1.0

    tps = B * T / (ms / 1e3)
    eff = mfu(tps * flops_mult, cfg)
    print(
        f"{label} B={B} T={T}: {ms:.1f} ms = {tps:,.0f} tok/s, "
        f"~{eff*100:.1f}% MFU (decoder matmuls only)"
    )


if __name__ == "__main__":
    main()
