"""Attention -> linear-attention conversion for distillation.

Equivalent of the reference's convert pass (src/llamafactory/model/convert.py:
15-175): given a dense softmax-attention teacher (e.g. Qwen2.5-VL), replace
every decoder layer NOT in `softmax_attention` with a freshly-initialized
Gated DeltaNet mixer (mimic_init warm start) while keeping the layer's MLP
and norms; preserved layers keep their attention weights and become the
sliding-attention layers of the hybrid.

Supported mixers: "gated_deltanet" (the shipped model) and "mamba2" (the
reference's alternative conversion target, convert.py:90-140) — the mamba2
path copies attention q/k/v into the SSD's C/B/x projections with GQA tile
replication (see convert_layer_to_mamba2 below).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax

from ..config import LINEAR, MAMBA2, SLIDING, TextConfig
from .params import init_delta_layer, init_mamba2_layer

Params = Dict[str, Any]

DEFAULT_SOFTMAX_LAYERS = tuple(range(0, 36, 4))  # examples/train_linear yaml

_MIXER_ALIASES = {
    "gated_deltanet": "gated_deltanet",
    "gateddeltanet": "gated_deltanet",
    "mamba2": "mamba2",
    "mamba2_new": "mamba2",
}


def _gqa_expand(kernel, bias, num_kv_heads: int, head_dim: int, groups: int):
    """Expand KV projection weights to all query heads with repeat_interleave
    order ([kv0, kv0, ..., kv1, kv1, ...]) — GQA maps query head i to kv
    head i // groups (transformers repeat_kv), so this preserves the
    teacher's per-head q.k geometry in the warm start.

    DELIBERATE deviation: the reference uses torch `.repeat(groups, 1, 1)`
    (model/convert.py:104-118), which TILES whole blocks ([kv0, kv1, kv0,
    kv1]) and pairs most query heads with the wrong teacher KV head — a
    likely bug there, since it breaks the mimic-init objective."""
    import jax.numpy as jnp

    D = kernel.shape[0]
    w = kernel.reshape(D, num_kv_heads, head_dim)
    w = jnp.repeat(w, groups, axis=1).reshape(
        D, num_kv_heads * groups * head_dim
    )
    b = None
    if bias is not None:
        b = jnp.repeat(
            bias.reshape(num_kv_heads, head_dim), groups, axis=0
        ).reshape(-1)
    return w, b


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
    sliding_attention; the rest become linear mixers with fresh (mimic_init)
    weights and the teacher's MLP/norms.

    Mixers (reference model/convert.py:15-175):
    - "gated_deltanet": the shipped InfiniteVL target; all mixer weights are
      freshly mimic-initialized.
    - "mamba2" (Mamba2_new): q/k/v/o are COPIED from the teacher's attention
      with GQA head expansion (k/v tiled across query groups); the SSD-side
      params (dt/A/D/conv/gate) are mimic-initialized.
    """
    mixer_key = _MIXER_ALIASES.get(mixer.lower())
    if mixer_key is None:
        raise NotImplementedError(
            f"mixer {mixer!r}: available mixers are "
            f"{sorted(set(_MIXER_ALIASES.values()))}"
        )
    softmax = set(softmax_attention)
    n = teacher_cfg.num_hidden_layers
    converted_type = LINEAR if mixer_key == "gated_deltanet" else MAMBA2
    layer_types = tuple(
        SLIDING if i in softmax else converted_type for i in range(n)
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
        if mixer_key == "gated_deltanet":
            fresh = init_delta_layer(
                keys[i], student_cfg, dtype, mimic_init=mimic_init
            )
        else:
            fresh = init_mamba2_layer(
                keys[i], student_cfg, dtype, mimic_init=mimic_init
            )
            # weight copy from the teacher's attention (convert.py:90-140):
            # q as-is, k/v GQA-expanded to all query heads, o as-is
            groups = (
                teacher_cfg.num_attention_heads // teacher_cfg.num_key_value_heads
            )
            fresh["q_proj"] = dict(lp["q_proj"])
            kw, kb = _gqa_expand(
                lp["k_proj"]["kernel"], lp["k_proj"].get("bias"),
                teacher_cfg.num_key_value_heads, teacher_cfg.head_dim, groups,
            )
            vw, vb = _gqa_expand(
                lp["v_proj"]["kernel"], lp["v_proj"].get("bias"),
                teacher_cfg.num_key_value_heads, teacher_cfg.head_dim, groups,
            )
            fresh["k_proj"] = {"kernel": kw} | ({"bias": kb} if kb is not None else {})
            fresh["v_proj"] = {"kernel": vw} | ({"bias": vb} if vb is not None else {})
            fresh["o_proj"] = dict(lp["o_proj"])
        # keep the teacher's MLP and norms (convert.py only swaps self_attn)
        fresh["mlp"] = lp["mlp"]
        fresh["input_norm"] = lp["input_norm"]
        fresh["post_norm"] = lp["post_norm"]
        new_layers.append(fresh)
    student = dict(teacher_params)
    student["layers"] = new_layers
    return student, student_cfg


def llama_pro_expand(
    params: Params,  # text tree
    cfg: TextConfig,
    num_expand: int,
) -> Tuple[Params, TextConfig]:
    """LLaMA-Pro block expansion (reference scripts/llama_pro.py): split the
    stack into `num_expand` groups and append after each group an IDENTITY
    copy of its last layer — o_proj and mlp.down zeroed so the new block is
    a no-op at init; training typically freezes the original layers."""
    import jax.numpy as jnp

    n = cfg.num_hidden_layers
    if num_expand <= 0 or n % num_expand:
        raise ValueError(
            f"num_expand must divide num_hidden_layers ({n}), got {num_expand}"
        )
    group = n // num_expand
    new_layers = []
    new_types = []
    for g in range(num_expand):
        for i in range(g * group, (g + 1) * group):
            new_layers.append(params["layers"][i])
            new_types.append(cfg.layer_types[i])
        src = params["layers"][(g + 1) * group - 1]
        copy = jax.tree.map(lambda x: x, src)
        copy = dict(copy)
        copy["o_proj"] = dict(copy["o_proj"])
        copy["o_proj"]["kernel"] = jnp.zeros_like(copy["o_proj"]["kernel"])
        copy["mlp"] = dict(copy["mlp"])
        copy["mlp"]["down"] = dict(copy["mlp"]["down"])
        copy["mlp"]["down"]["kernel"] = jnp.zeros_like(
            copy["mlp"]["down"]["kernel"]
        )
        new_layers.append(copy)
        new_types.append(cfg.layer_types[(g + 1) * group - 1])
    new_params = dict(params)
    new_params["layers"] = new_layers
    new_cfg = dataclasses.replace(
        cfg,
        num_hidden_layers=n + num_expand,
        layer_types=tuple(new_types),
    )
    return new_params, new_cfg


def expansion_trainable_mask(params: Params, cfg: TextConfig, num_expand: int) -> Params:
    """Freeze-all-but-the-new-blocks mask for llama_pro finetuning: the new
    blocks sit at positions (g+1)*group + g for each group g."""
    n = cfg.num_hidden_layers  # post-expansion count
    group = (n - num_expand) // num_expand
    new_idx = {(g + 1) * group + g for g in range(num_expand)}
    out = {
        k: jax.tree.map(lambda _: False, v)
        for k, v in params.items()
        if k != "layers"
    }
    out["layers"] = [
        jax.tree.map(lambda _: i in new_idx, lp)
        for i, lp in enumerate(params["layers"])
    ]
    return out


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
        # mamba2 mixer params
        "dt_proj", "conv_w", "conv_b", "D",
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
