"""Perplexity over a registered dataset (reference scripts/stat_utils/cal_ppl.py).

    python scripts/cal_ppl.py examples/sft_tiny.yaml
"""

import sys

sys.path.insert(0, ".")


def main(config_path: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from infinitevl_tpu.cli import _tokenizer
    from infinitevl_tpu.hparams import load_yaml_args
    from infinitevl_tpu.models.params import init_text_params, load_hf_checkpoint
    from infinitevl_tpu.models.text import embed_tokens, lm_head, text_forward
    from infinitevl_tpu.train.trainer import build_config, build_dataset, collate

    args = load_yaml_args(config_path)
    cfg = build_config(args)
    dtype = jnp.bfloat16 if args.train.bf16 else jnp.float32
    if args.model.model_name_or_path:
        params = load_hf_checkpoint(args.model.model_name_or_path, cfg, dtype)["text"]
    else:
        params = init_text_params(jax.random.PRNGKey(0), cfg.text, dtype)
    data = build_dataset(args, _tokenizer(args, cfg))

    @jax.jit
    def nll(batch):
        h, _, _ = text_forward(
            params, cfg.text, embed_tokens(params, batch["input_ids"]),
            batch["position_ids"], None, batch.get("segment_ids"),
        )
        logits = lm_head(params, cfg.text, h)
        labels = batch["labels"]
        mask = labels != -100
        safe = jnp.where(mask, labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return -(tok * mask).sum(), mask.sum()

    total, count = 0.0, 0
    for batch in collate(
        data, args.train.per_device_train_batch_size, args.data.cutoff_len,
        epochs=1.0,
    ):
        loss_sum, n = nll(batch)
        total += float(loss_sum)
        count += int(n)
    ppl = np.exp(total / max(count, 1))
    print(f"tokens: {count}  nll/token: {total/max(count,1):.4f}  ppl: {ppl:.3f}")


if __name__ == "__main__":
    main(sys.argv[1])
