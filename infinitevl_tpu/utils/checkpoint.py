"""Checkpointing: orbax train-state save/resume + HF safetensors export.

Covers the reference's checkpoint surface (SURVEY.md §5.4): periodic trainer
checkpoints with resume (HF Trainer equivalent -> orbax), stage-to-stage
handoff that excludes preserved softmax layers (dt/workflow.py:57-75), and
`export_model`-style safetensors export (train/tuner.py:113-198) so
checkpoints round-trip with the HF ecosystem (and with models.params'
loader)."""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Orbax train-state checkpoints
# ---------------------------------------------------------------------------


def save_train_state(path: str, step: int, state: Dict[str, Any]) -> None:
    """state: arbitrary pytree (params, opt_state, rng, ...)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_train_state(
    path: str, step: Optional[int] = None, template: Optional[Dict[str, Any]] = None
):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None, None
        if template is not None:
            out = mgr.restore(step, args=ocp.args.StandardRestore(template))
        else:
            out = mgr.restore(step)
        return step, out


def latest_step(path: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
        return mgr.latest_step()


def filter_softmax_layers(
    params: Dict[str, Any], softmax_attention: Sequence[int]
) -> Dict[str, Any]:
    """Stage-handoff filter: drop preserved-attention layer weights so the
    frozen teacher layers stay pristine when loading a stage checkpoint
    (dt/workflow.py:57-75 semantics). Returns a pytree with those layers'
    attention params removed (MLP/norms kept)."""
    softmax = set(softmax_attention)
    attn_keys = {
        "q_proj", "k_proj", "v_proj", "o_proj", "a_proj", "b_proj", "g_proj",
        "A_log", "dt_bias", "o_norm",
        "conv_q_w", "conv_k_w", "conv_v_w", "conv_q_b", "conv_k_b", "conv_v_b",
    }
    out = dict(params)
    out["layers"] = [
        {k: v for k, v in lp.items() if not (i in softmax and k in attn_keys)}
        for i, lp in enumerate(params["layers"])
    ]
    return out


def merge_params(base: Dict[str, Any], update: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively overlay `update` onto `base` (missing keys keep base)."""
    if isinstance(base, dict):
        out = dict(base)
        for k, v in (update or {}).items():
            out[k] = merge_params(base[k], v) if k in base else v
        return out
    if isinstance(base, (list, tuple)):
        return type(base)(
            merge_params(b, u) for b, u in zip(base, update)
        )
    return update if update is not None else base


# ---------------------------------------------------------------------------
# HF safetensors export (inverse of models/params.py loading)
# ---------------------------------------------------------------------------


def _np_bf16(x: jax.Array) -> np.ndarray:
    arr = np.asarray(x)
    return arr


def export_hf_safetensors(
    params: Dict[str, Any],
    cfg,
    out_dir: str,
    max_shard_bytes: int = 4 * 1024**3,
) -> None:
    """Write an HF-layout safetensors checkpoint (model.language_model.* /
    model.visual.* names) + config.json, loadable by models.params.
    Tensors are written in their array dtype (bf16 kept as bf16)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}

    def put_linear(name, p):
        tensors[f"{name}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            tensors[f"{name}.bias"] = np.asarray(p["bias"])

    text = params["text"]
    tensors["model.language_model.embed_tokens.weight"] = np.asarray(text["embed"])
    tensors["model.language_model.norm.weight"] = np.asarray(text["final_norm"])
    for i, lp in enumerate(text["layers"]):
        pre = f"model.language_model.layers.{i}"
        tensors[f"{pre}.input_layernorm.weight"] = np.asarray(lp["input_norm"])
        tensors[f"{pre}.post_attention_layernorm.weight"] = np.asarray(lp["post_norm"])
        for mk, hk in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
            put_linear(f"{pre}.mlp.{hk}", lp["mlp"][mk])
        sa = f"{pre}.self_attn"
        for k in ("q_proj", "k_proj", "v_proj", "o_proj", "a_proj", "b_proj", "g_proj"):
            if k in lp:
                put_linear(f"{sa}.{k}", lp[k])
        for k in ("A_log", "dt_bias"):
            if k in lp:
                tensors[f"{sa}.{k}"] = np.asarray(lp[k])
        if "o_norm" in lp:
            tensors[f"{sa}.o_norm.weight"] = np.asarray(lp["o_norm"])
        for w in "qkv":
            key = f"conv_{w}_w"
            if key in lp:
                # [W, D] -> torch Conv1d [D, 1, W]
                tensors[f"{sa}.{w}_conv1d.weight"] = np.asarray(lp[key]).T[:, None, :]
            key_b = f"conv_{w}_b"
            if key_b in lp:
                tensors[f"{sa}.{w}_conv1d.bias"] = np.asarray(lp[key_b])
    if "lm_head" in text:
        tensors["lm_head.weight"] = np.asarray(text["lm_head"]).T

    if "visual" in params:
        vis = params["visual"]
        v = cfg.vision
        pe = np.asarray(vis["patch_embed"]).T.reshape(
            v.hidden_size, v.in_channels, v.temporal_patch_size, v.patch_size, v.patch_size
        )
        tensors["model.visual.patch_embed.proj.weight"] = pe
        for i, bp in enumerate(vis["blocks"]):
            pre = f"model.visual.blocks.{i}"
            tensors[f"{pre}.norm1.weight"] = np.asarray(bp["norm1"])
            tensors[f"{pre}.norm2.weight"] = np.asarray(bp["norm2"])
            put_linear(f"{pre}.attn.qkv", bp["qkv"])
            put_linear(f"{pre}.attn.proj", bp["proj"])
            for mk, hk in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
                put_linear(f"{pre}.mlp.{hk}", bp["mlp"][mk])
        m = vis["merger"]
        tensors["model.visual.merger.ln_q.weight"] = np.asarray(m["ln_q"])
        put_linear("model.visual.merger.mlp.0", m["fc1"])
        put_linear("model.visual.merger.mlp.2", m["fc2"])

    # safetensors serializes the raw buffer: transposed views must be
    # materialized contiguously or the data is silently scrambled
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}

    # shard by size
    shards: list[Dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for name in sorted(tensors):
        t = tensors[name]
        nb = t.size * t.dtype.itemsize
        if sizes[-1] + nb > max_shard_bytes and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = t
        sizes[-1] += nb
    if len(shards) == 1:
        save_file(shards[0], os.path.join(out_dir, "model.safetensors"))
    else:
        index = {"weight_map": {}, "metadata": {"total_size": sum(sizes)}}
        for si, shard in enumerate(shards, 1):
            fn = f"model-{si:05d}-of-{len(shards):05d}.safetensors"
            save_file(shard, os.path.join(out_dir, fn))
            for name in shard:
                index["weight_map"][name] = fn
        with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
            json.dump(index, f, indent=2)

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config_to_hf_dict(cfg), f, indent=2)


def config_to_hf_dict(cfg) -> Dict[str, Any]:
    t, v = cfg.text, cfg.vision
    return {
        "architectures": ["InfiniteVLQwen2_5_VLForConditionalGeneration"],
        "model_type": "infinite_vl",
        "hidden_size": t.hidden_size,
        "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_hidden_layers,
        "num_attention_heads": t.num_attention_heads,
        "num_key_value_heads": t.num_key_value_heads,
        "head_dim": t.head_dim,
        "vocab_size": t.vocab_size,
        "rms_norm_eps": t.rms_norm_eps,
        "norm_eps": t.norm_eps,
        "rope_theta": t.rope_theta,
        "max_position_embeddings": t.max_position_embeddings,
        "use_sliding_window": t.use_sliding_window,
        "sliding_window": t.sliding_window,
        "layer_types": list(t.layer_types),
        "tie_word_embeddings": t.tie_word_embeddings,
        "expand_v": t.expand_v,
        "conv_size": t.conv_size,
        "conv_bias": t.conv_bias,
        "num_linear_heads": t.num_linear_heads,
        "num_linear_key_value_heads": t.num_linear_key_value_heads,
        "linear_head_dim": t.linear_head_dim,
        "rope_scaling": {
            "mrope_section": list(t.mrope_section),
            "rope_type": t.rope_type,
            "type": t.rope_type,
            **(
                {
                    "factor": t.rope_factor,
                    "original_max_position_embeddings": t.rope_original_max_position_embeddings,
                }
                if t.rope_type != "default"
                else {}
            ),
        },
        "image_token_id": cfg.image_token_id,
        "video_token_id": cfg.video_token_id,
        "vision_start_token_id": cfg.vision_start_token_id,
        "vision_end_token_id": cfg.vision_end_token_id,
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": cfg.eos_token_id,
        "vision_config": {
            "depth": v.depth,
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_heads": v.num_heads,
            "in_channels": v.in_channels,
            "patch_size": v.patch_size,
            "spatial_merge_size": v.spatial_merge_size,
            "temporal_patch_size": v.temporal_patch_size,
            "tokens_per_second": v.tokens_per_second,
            "window_size": v.window_size,
            "out_hidden_size": v.out_hidden_size,
            "fullatt_block_indexes": list(v.fullatt_block_indexes),
        },
    }
