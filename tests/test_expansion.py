"""PiSSA decomposition and LLaMA-Pro block expansion (reference
scripts/llama_pro.py + pissa init)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.convert import expansion_trainable_mask, llama_pro_expand
from infinitevl_tpu.models.params import init_text_params
from infinitevl_tpu.models.text import embed_tokens, text_forward
from infinitevl_tpu.train.lora import apply_lora, pissa_decompose


def test_pissa_reconstructs_base():
    cfg = tiny_config(num_hidden_layers=4).text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tree = {"text": params}
    residual, lora = pissa_decompose(tree, jax.random.PRNGKey(1), rank=4)
    # residual + a@b (scale 1 => alpha == rank) == original
    merged = apply_lora(residual, lora, alpha=4.0, rank=4)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # the adapter actually carries the principal energy: a@b has the same
    # top singular value as the base kernel
    w = np.asarray(params["layers"][0]["q_proj"]["kernel"])
    la = np.asarray(lora["text"]["layers"][0]["q_proj"]["a"])
    lb = np.asarray(lora["text"]["layers"][0]["q_proj"]["b"])
    s_base = np.linalg.svd(w, compute_uv=False)
    s_ad = np.linalg.svd(la @ lb, compute_uv=False)
    np.testing.assert_allclose(s_ad[:4], s_base[:4], rtol=1e-4)


def test_pissa_reconstructs_with_alpha_scaling():
    """apply_lora scales by alpha/rank; pissa factors pre-divide so the
    init invariant holds for alpha != rank too."""
    cfg = tiny_config(num_hidden_layers=2).text
    params = init_text_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    tree = {"text": params}
    residual, lora = pissa_decompose(
        tree, jax.random.PRNGKey(3), rank=4, alpha=16.0
    )
    merged = apply_lora(residual, lora, alpha=16.0, rank=4)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_llama_pro_identity_expansion():
    cfg = tiny_config(num_hidden_layers=4).text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    new_params, new_cfg = llama_pro_expand(params, cfg, num_expand=2)
    assert new_cfg.num_hidden_layers == 6
    assert len(new_params["layers"]) == 6
    # layer types follow the copied layers
    assert new_cfg.layer_types[2] == cfg.layer_types[1]
    # expansion is a no-op at init: identical forward outputs
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 100, (1, 12)))
    pos = jnp.broadcast_to(jnp.arange(12)[None, None], (3, 1, 12))
    h0, _, _ = text_forward(params, cfg, embed_tokens(params, ids), pos, None)
    h1, _, _ = text_forward(
        new_params, new_cfg, embed_tokens(new_params, ids), pos, None
    )
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)
    # trainable mask marks exactly the two inserted blocks
    mask = expansion_trainable_mask(new_params, new_cfg, 2)
    flags = [bool(jax.tree.leaves(lp)[0]) for lp in mask["layers"]]
    assert flags == [False, False, True, False, False, True]
