"""LoRA adapters: structure, zero-init identity, training, merging."""

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.params import init_text_params
from infinitevl_tpu.models.text import embed_tokens, text_forward
from infinitevl_tpu.train.lora import (
    apply_lora,
    init_lora,
    make_lora_sft_step,
    merge_lora,
)
from infinitevl_tpu.train.step import make_optimizer


def test_lora_zero_init_is_identity():
    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    lora = init_lora(params, jax.random.PRNGKey(1), rank=4)
    patched = apply_lora(params, lora, alpha=8, rank=4)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(8)[None, None], (3, 1, 8))
    h1, _, _ = text_forward(params["text"], cfg, embed_tokens(params["text"], ids), pos)
    h2, _, _ = text_forward(patched["text"], cfg, embed_tokens(patched["text"], ids), pos)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_lora_targets_only_named_projections():
    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    lora = init_lora(params, jax.random.PRNGKey(1), rank=4,
                     target=("q_proj", "v_proj"))
    layer0 = lora["text"]["layers"][0]
    assert "q_proj" in layer0 and "v_proj" in layer0
    assert "k_proj" not in layer0 and "mlp" not in layer0
    n_adapter = sum(x.size for x in jax.tree.leaves(lora))
    n_base = sum(x.size for x in jax.tree.leaves(params))
    assert n_adapter < 0.1 * n_base


def test_lora_training_reduces_loss_and_freezes_base():
    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    base_snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    lora = init_lora(params, jax.random.PRNGKey(1), rank=4)
    tx = make_optimizer(learning_rate=5e-3, weight_decay=0.0)
    opt_state = tx.init(lora)
    step = jax.jit(make_lora_sft_step(cfg, tx, params, alpha=8, rank=4))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, cfg.vocab_size)
    batch = {
        "input_ids": ids,
        "labels": ids,
        "position_ids": jnp.broadcast_to(jnp.arange(12)[None, None], (3, 2, 12)),
    }
    l0 = None
    for i in range(6):
        lora, opt_state, loss = step(lora, opt_state, batch)
        if i == 0:
            l0 = float(loss)
    assert float(loss) < l0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(base_snapshot)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # merged model differs from base
    merged = merge_lora(params, lora, alpha=8, rank=4)
    d = np.abs(
        np.asarray(merged["text"]["layers"][0]["q_proj"]["kernel"])
        - np.asarray(params["text"]["layers"][0]["q_proj"]["kernel"])
    ).max()
    assert d > 0
