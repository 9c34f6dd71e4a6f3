"""Attention -> linear-attention conversion for distillation.

Equivalent of the reference's convert pass (src/llamafactory/model/convert.py:
15-175): given a dense softmax-attention teacher (e.g. Qwen2.5-VL), replace
every decoder layer NOT in `softmax_attention` with a freshly-initialized
Gated DeltaNet mixer (mimic_init warm start) while keeping the layer's MLP
and norms; preserved layers keep their attention weights and become the
sliding-attention layers of the hybrid.

Supported mixers: "gated_deltanet" (the shipped model). "mamba2" exists in
the reference as an alternative conversion target (convert.py:90-140); here
it raises with a pointer until that model family lands.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax

from ..config import FULL, LINEAR, SLIDING, TextConfig
from .params import init_delta_layer

Params = Dict[str, Any]

DEFAULT_SOFTMAX_LAYERS = tuple(range(0, 36, 4))  # examples/train_linear yaml


def convert_attention(
    teacher_params: Params,  # text param tree
    teacher_cfg: TextConfig,
    key: jax.Array,
    softmax_attention: Sequence[int] = DEFAULT_SOFTMAX_LAYERS,
    mixer: str = "gated_deltanet",
    mimic_init: bool = True,
    dtype=None,
) -> Tuple[Params, TextConfig]:
    """Returns (student_params, student_cfg). Preserved layers become
    sliding_attention; the rest become linear_attention DeltaNet layers with
    fresh (mimic_init) mixer weights and the teacher's MLP/norms."""
    if mixer != "gated_deltanet":
        raise NotImplementedError(
            f"mixer {mixer!r}: only gated_deltanet is implemented; the "
            "reference also offers mamba2 (model/convert.py:90-140)"
        )
    softmax = set(softmax_attention)
    n = teacher_cfg.num_hidden_layers
    layer_types = tuple(
        SLIDING if i in softmax else LINEAR for i in range(n)
    )
    student_cfg = dataclasses.replace(
        teacher_cfg,
        layer_types=layer_types,
        use_sliding_window=True,
        sliding_window=teacher_cfg.sliding_window or 8192,
    )
    if dtype is None:
        dtype = teacher_params["embed"].dtype
    keys = jax.random.split(key, n)
    new_layers = []
    for i, lp in enumerate(teacher_params["layers"]):
        if i in softmax:
            new_layers.append(lp)
            continue
        fresh = init_delta_layer(keys[i], student_cfg, dtype, mimic_init=mimic_init)
        # keep the teacher's MLP and norms (convert.py only swaps self_attn)
        fresh["mlp"] = lp["mlp"]
        fresh["input_norm"] = lp["input_norm"]
        fresh["post_norm"] = lp["post_norm"]
        new_layers.append(fresh)
    student = dict(teacher_params)
    student["layers"] = new_layers
    return student, student_cfg


def trainable_mask(
    params: Params,
    cfg: TextConfig,
    distill_weights: Sequence[str] = ("self_attn",),
    softmax_attention: Sequence[int] = DEFAULT_SOFTMAX_LAYERS,
) -> Params:
    """Bool pytree: True = trainable. Mirrors _setup_distill_tuning
    (model/adapter.py:249-269): a param trains iff its name matches one of
    `distill_weights` and its layer is not preserved. "self_attn" matches
    the mixer params of a DeltaNet layer (everything except mlp/norms)."""
    softmax = set(softmax_attention)
    mixer_keys = {
        "q_proj", "k_proj", "v_proj", "a_proj", "b_proj", "g_proj",
        "o_proj", "A_log", "dt_bias", "o_norm",
        "conv_q_w", "conv_k_w", "conv_v_w", "conv_q_b", "conv_k_b", "conv_v_b",
    }

    def mask_layer(i, lp):
        train_attn = (i not in softmax) and any(
            w in ("self_attn", "attn") for w in distill_weights
        )
        out = {}
        for k, v in lp.items():
            flag = train_attn and k in mixer_keys
            out[k] = jax.tree.map(lambda _: flag, v)
        return out

    out = {k: jax.tree.map(lambda _: False, v) for k, v in params.items() if k != "layers"}
    out["layers"] = [mask_layer(i, lp) for i, lp in enumerate(params["layers"])]
    return out
