"""Parameter pytree construction: random init and HF-checkpoint loading.

Pytree layout (kernels are [in, out], i.e. transposed from torch Linear):

params = {
  'text': {
    'embed': [vocab, D], 'final_norm': [D], 'inv_freq': [head_dim/2],
    ('lm_head': [D, vocab]   only when not tied),
    'layers': ( per-layer dicts, SWA or DeltaNet flavor ... ),
  },
  'visual': {
    'patch_embed': [in_feat, Dv],
    'blocks': ( per-block dicts ... ),
    'merger': {'ln_q': [Dv], 'fc1': {...}, 'fc2': {...}},
  },
}

HF name mapping covers both checkpoint layouts the reference accepts
(modeling_infinitevl.py:1976-1978 `_checkpoint_conversion_mapping`
{"^model": "language_model"}): `model.language_model.*` / `model.visual.*`
(new) and `model.*` / `visual.*` (legacy).
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LINEAR, MAMBA2, InfiniteVLConfig, TextConfig, VisionConfig
from ..ops.rope import rope_init

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Random init
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, std, bias=False, dtype=jnp.bfloat16):
    k1, _ = jax.random.split(key)
    p = {"kernel": (jax.random.truncated_normal(k1, -2, 2, (d_in, d_out)) * std).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype=dtype)
    return p


def init_swa_layer(key, cfg: TextConfig, dtype=jnp.bfloat16) -> Params:
    D = cfg.hidden_size
    std = 0.02
    ks = jax.random.split(key, 8)
    return {
        "input_norm": jnp.ones((D,), dtype=dtype),
        "post_norm": jnp.ones((D,), dtype=dtype),
        "q_proj": _linear(ks[0], D, cfg.num_attention_heads * cfg.head_dim, std, bias=True, dtype=dtype),
        "k_proj": _linear(ks[1], D, cfg.num_key_value_heads * cfg.head_dim, std, bias=True, dtype=dtype),
        "v_proj": _linear(ks[2], D, cfg.num_key_value_heads * cfg.head_dim, std, bias=True, dtype=dtype),
        "o_proj": _linear(ks[3], cfg.num_attention_heads * cfg.head_dim, D, std, dtype=dtype),
        "mlp": {
            "gate": _linear(ks[4], D, cfg.intermediate_size, std, dtype=dtype),
            "up": _linear(ks[5], D, cfg.intermediate_size, std, dtype=dtype),
            "down": _linear(ks[6], cfg.intermediate_size, D, std, dtype=dtype),
        },
    }


def _delta_decay_init(key, num_heads):
    """A_log ~ log(U(0,16)), dt_bias = softplus^-1(U(1e-3, 0.1)) — the
    reference's hard-coded init (modeling_infinitevl.py:1168-1184)."""
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (num_heads,), minval=1e-4, maxval=16.0)
    a_log = jnp.log(a)
    dt = jnp.exp(
        jax.random.uniform(k2, (num_heads,))
        * (math.log(0.1) - math.log(1e-3))
        + math.log(1e-3)
    )
    dt = jnp.clip(dt, 1e-4, None)
    inv_dt = dt + jnp.log(-jnp.expm1(-dt))
    return a_log.astype(jnp.float32), inv_dt.astype(jnp.float32)


def init_delta_layer(
    key, cfg: TextConfig, dtype=jnp.bfloat16, mimic_init: bool = False
) -> Params:
    """DeltaNet layer params.

    mimic_init (the distillation warm start, fla/layers/gated_deltanet.py:138-189):
    conv = identity tap, a/b projections zeroed, A = 1, dt ~= 1e-3 so the
    layer starts out approximating softmax attention's value path."""
    D = cfg.hidden_size
    HK = cfg.num_linear_heads * cfg.linear_head_dim
    KD = cfg.linear_key_dim
    VD = cfg.linear_value_dim
    HV = cfg.num_linear_heads * cfg.head_v_dim
    W = cfg.conv_size
    std = 0.02
    ks = jax.random.split(key, 12)
    a_log, dt_bias = _delta_decay_init(ks[0], cfg.num_linear_heads)

    def conv_w(k, d):
        # torch Conv1d default: kaiming-uniform fan_in = W
        bound = 1.0 / math.sqrt(W)
        return jax.random.uniform(k, (W, d), minval=-bound, maxval=bound).astype(dtype)

    p = {
        "input_norm": jnp.ones((D,), dtype=dtype),
        "post_norm": jnp.ones((D,), dtype=dtype),
        "q_proj": _linear(ks[1], D, HK, std, dtype=dtype),
        "k_proj": _linear(ks[2], D, KD, std, dtype=dtype),
        "v_proj": _linear(ks[3], D, VD, std, dtype=dtype),
        "a_proj": _linear(ks[4], D, cfg.num_linear_heads, std, dtype=dtype),
        "b_proj": _linear(ks[5], D, cfg.num_linear_heads, std, dtype=dtype),
        "g_proj": _linear(ks[6], D, HV, std, dtype=dtype),
        "o_proj": _linear(ks[7], HV, D, std, dtype=dtype),
        "A_log": a_log,
        "dt_bias": dt_bias,
        "o_norm": jnp.ones((cfg.head_v_dim,), dtype=dtype),
        "conv_q_w": conv_w(ks[8], HK),
        "conv_k_w": conv_w(ks[9], KD),
        "conv_v_w": conv_w(ks[10], VD),
        "mlp": {
            "gate": _linear(ks[11], D, cfg.intermediate_size, std, dtype=dtype),
            "up": _linear(jax.random.fold_in(key, 101), D, cfg.intermediate_size, std, dtype=dtype),
            "down": _linear(jax.random.fold_in(key, 102), cfg.intermediate_size, D, std, dtype=dtype),
        },
    }
    if cfg.conv_bias:
        p["conv_q_b"] = jnp.zeros((HK,), dtype=dtype)
        p["conv_k_b"] = jnp.zeros((KD,), dtype=dtype)
        p["conv_v_b"] = jnp.zeros((VD,), dtype=dtype)
    if mimic_init:
        ident = jnp.zeros((W,), dtype=dtype).at[W - 1].set(1.0)
        p["conv_q_w"] = jnp.tile(ident[:, None], (1, HK))
        p["conv_k_w"] = jnp.tile(ident[:, None], (1, KD))
        p["conv_v_w"] = jnp.tile(ident[:, None], (1, VD))
        p["a_proj"]["kernel"] = jnp.zeros_like(p["a_proj"]["kernel"])
        p["b_proj"]["kernel"] = jnp.zeros_like(p["b_proj"]["kernel"])
        p["A_log"] = jnp.zeros_like(p["A_log"])  # A = 1
        dt = jnp.full((cfg.num_linear_heads,), 1e-3)
        p["dt_bias"] = (dt + jnp.log(-jnp.expm1(-dt))).astype(jnp.float32)
    return p


def init_mamba2_layer(
    key, cfg: TextConfig, dtype=jnp.bfloat16, mimic_init: bool = False
) -> Params:
    """Mamba2 mixer layer params (reference fla/layers/mamba2_new.py:38-160):
    q/k/v (= C/B/x) with bias, fused conv over [v, k, q], dt in_proj, per-head
    dt_bias / A_log / D, gated RMSNorm, o_proj.

    mimic_init matches the reference warm start: conv = identity tap,
    dt in_proj zeroed, dt_bias = inv-softplus of a small dt, A_log = 1."""
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    Dh = cfg.head_dim
    HD = H * Dh
    W = cfg.conv_size
    std = 0.02
    ks = jax.random.split(key, 10)
    bound = 1.0 / math.sqrt(W)
    conv_w = jax.random.uniform(
        ks[0], (W, 3 * HD), minval=-bound, maxval=bound
    ).astype(dtype)
    # dt sampled log-uniform in [1e-3, 0.1] then inverse-softplus
    # (mamba2_new.py:130-140)
    dt = jnp.exp(
        jax.random.uniform(ks[1], (H,))
        * (math.log(0.1) - math.log(0.001))
        + math.log(0.001)
    )
    dt = jnp.clip(dt, 0.001)
    inv_dt = dt + jnp.log(-jnp.expm1(-dt))
    p = {
        "input_norm": jnp.ones((D,), dtype=dtype),
        "post_norm": jnp.ones((D,), dtype=dtype),
        "q_proj": _linear(ks[2], D, HD, std, dtype=dtype, bias=True),
        "k_proj": _linear(ks[3], D, HD, std, dtype=dtype, bias=True),
        "v_proj": _linear(ks[4], D, HD, std, dtype=dtype, bias=True),
        "o_proj": _linear(ks[5], HD, D, std, dtype=dtype),
        "dt_proj": _linear(ks[6], D, H, std, dtype=dtype),
        "g_proj": _linear(ks[7], D, HD, std * 2**-2.5, dtype=dtype),
        "conv_w": conv_w,
        "conv_b": jnp.zeros((3 * HD,), dtype=dtype),
        "dt_bias": (
            inv_dt if mimic_init else jnp.zeros((H,))
        ).astype(jnp.float32),
        "A_log": (
            jnp.ones((H,))
            if mimic_init
            else jnp.log(jax.random.uniform(ks[8], (H,), minval=1.0, maxval=16.0))
        ).astype(jnp.float32),
        "D": jnp.ones((H,), dtype=jnp.float32),
        "o_norm": jnp.ones((Dh,), dtype=dtype),
        "mlp": {
            "gate": _linear(ks[9], D, cfg.intermediate_size, std, dtype=dtype),
            "up": _linear(jax.random.fold_in(key, 201), D, cfg.intermediate_size, std, dtype=dtype),
            "down": _linear(jax.random.fold_in(key, 202), cfg.intermediate_size, D, std, dtype=dtype),
        },
    }
    if mimic_init:
        ident = jnp.zeros((W,), dtype=dtype).at[W - 1].set(1.0)
        p["conv_w"] = jnp.tile(ident[:, None], (1, 3 * HD))
        p["dt_proj"]["kernel"] = jnp.zeros_like(p["dt_proj"]["kernel"])
    return p


def init_text_params(key, cfg: TextConfig, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, cfg.num_hidden_layers + 2)
    layers = []
    for i in range(cfg.num_hidden_layers):
        role = cfg.layer_role(i)
        if role == LINEAR:
            layers.append(init_delta_layer(ks[i], cfg, dtype))
        elif role == MAMBA2:
            layers.append(init_mamba2_layer(ks[i], cfg, dtype))
        else:  # sliding or full attention share the same parameter shape
            layers.append(init_swa_layer(ks[i], cfg, dtype))
    p = {
        "embed": (
            jax.random.truncated_normal(ks[-1], -2, 2, (cfg.vocab_size, cfg.hidden_size)) * 0.02
        ).astype(dtype),
        "final_norm": jnp.ones((cfg.hidden_size,), dtype=dtype),
        "inv_freq": jnp.asarray(rope_init(cfg)[0], dtype=jnp.float32),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = (
            jax.random.truncated_normal(ks[-2], -2, 2, (cfg.hidden_size, cfg.vocab_size)) * 0.02
        ).astype(dtype)
    return p


def init_vision_params(key, cfg: VisionConfig, dtype=jnp.bfloat16) -> Params:
    D = cfg.hidden_size
    std = 0.02
    in_feat = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
    ks = jax.random.split(key, cfg.depth + 3)
    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(ks[i], 6)
        blocks.append(
            {
                "norm1": jnp.ones((D,), dtype=dtype),
                "norm2": jnp.ones((D,), dtype=dtype),
                "qkv": _linear(bk[0], D, 3 * D, std, bias=True, dtype=dtype),
                "proj": _linear(bk[1], D, D, std, bias=True, dtype=dtype),
                "mlp": {
                    "gate": _linear(bk[2], D, cfg.intermediate_size, std, bias=True, dtype=dtype),
                    "up": _linear(bk[3], D, cfg.intermediate_size, std, bias=True, dtype=dtype),
                    "down": _linear(bk[4], cfg.intermediate_size, D, std, bias=True, dtype=dtype),
                },
            }
        )
    merged = D * cfg.spatial_merge_unit
    return {
        "patch_embed": (
            jax.random.truncated_normal(ks[-1], -2, 2, (in_feat, D)) * std
        ).astype(dtype),
        "blocks": blocks,
        "merger": {
            "ln_q": jnp.ones((D,), dtype=dtype),
            "fc1": _linear(ks[-2], merged, merged, std, bias=True, dtype=dtype),
            "fc2": _linear(ks[-3], merged, cfg.out_hidden_size, std, bias=True, dtype=dtype),
        },
    }


def init_params(key, cfg: InfiniteVLConfig, dtype=jnp.bfloat16) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "text": init_text_params(k1, cfg.text, dtype),
        "visual": init_vision_params(k2, cfg.vision, dtype),
    }


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# HF checkpoint loading
# ---------------------------------------------------------------------------


def _strip_prefix(name: str) -> Optional[Tuple[str, str]]:
    """Normalize an HF tensor name -> ('text'|'visual'|'lm_head', rest)."""
    for pre in ("model.language_model.", "language_model.", "model.model."):
        if name.startswith(pre):
            return "text", name[len(pre):]
    for pre in ("model.visual.", "visual."):
        if name.startswith(pre):
            return "visual", name[len(pre):]
    if name in ("lm_head.weight",):
        return "lm_head", ""
    if name.startswith("model."):
        return "text", name[len("model."):]
    return None


def _iter_safetensors(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = []
    if os.path.isdir(path):
        index = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index):
            with open(index) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
            files = [os.path.join(path, f) for f in files]
        else:
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".safetensors")
            )
    else:
        files = [path]
    for fp in files:
        with safe_open(fp, framework="numpy") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _to_jnp(arr: np.ndarray, dtype) -> jax.Array:
    if arr.dtype == np.dtype("V2"):  # raw bf16 from safetensors numpy
        arr = arr.view(np.uint16)
        x = jnp.asarray(arr).view(jnp.bfloat16)
    else:
        x = jnp.asarray(arr)
    return x.astype(dtype)


def load_hf_checkpoint(
    path: str,
    cfg: InfiniteVLConfig,
    dtype=jnp.bfloat16,
    params: Optional[Params] = None,
) -> Params:
    """Load an HF-format InfiniteVL/Qwen2.5-VL-style safetensors checkpoint
    into the params pytree. When `params` is given, tensors are loaded into
    a copy of it (missing tensors keep their initialized values)."""
    if params is None:
        params = jax.eval_shape(
            lambda: init_params(jax.random.PRNGKey(0), cfg, dtype)
        )
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), params
        )
        # derived constants are not checkpoint tensors; rebuild from config
        params["text"]["inv_freq"] = jnp.asarray(
            rope_init(cfg.text)[0],
            dtype=jnp.float32,
        )
    else:
        params = jax.tree.map(lambda x: x, params)  # shallow copy of tree

    text = dict(params["text"])
    text_layers = [dict(l) for l in text["layers"]]
    visual = dict(params["visual"])
    vis_blocks = [dict(b) for b in visual["blocks"]]
    merger = dict(visual["merger"])

    tcfg = cfg.text
    loaded = 0
    for name, arr in _iter_safetensors(path):
        hit = _strip_prefix(name)
        if hit is None:
            continue
        scope, rest = hit
        if scope == "lm_head":
            text["lm_head"] = _to_jnp(arr.T, dtype)
            loaded += 1
            continue
        if scope == "text":
            loaded += _load_text_tensor(text, text_layers, tcfg, rest, arr, dtype)
        else:
            loaded += _load_visual_tensor(vis_blocks, visual, merger, rest, arr, dtype)

    text["layers"] = [dict(l) for l in text_layers]
    visual["merger"] = merger
    visual["blocks"] = vis_blocks
    if tcfg.tie_word_embeddings and "lm_head" in text:
        # tied checkpoints may still store lm_head == embed; prefer tied math
        del text["lm_head"]
    out = {"text": text, "visual": visual}
    if loaded == 0:
        raise ValueError(f"no tensors matched under {path}")
    return out


def _set_linear(dst: Dict, key: str, arr: np.ndarray, dtype, is_bias: bool):
    p = dict(dst.get(key, {}))
    if is_bias:
        p["bias"] = _to_jnp(arr, dtype)
    else:
        p["kernel"] = _to_jnp(arr.T, dtype)
    dst[key] = p


def _load_text_tensor(text, layers, tcfg: TextConfig, rest, arr, dtype) -> int:
    if rest == "embed_tokens.weight":
        text["embed"] = _to_jnp(arr, dtype)
        return 1
    if rest == "norm.weight":
        text["final_norm"] = _to_jnp(arr, dtype)
        return 1
    if not rest.startswith("layers."):
        return 0
    parts = rest.split(".")
    idx = int(parts[1])
    tail = ".".join(parts[2:])
    lp = layers[idx]
    is_bias = tail.endswith(".bias")
    if tail == "input_layernorm.weight":
        lp["input_norm"] = _to_jnp(arr, dtype)
    elif tail == "post_attention_layernorm.weight":
        lp["post_norm"] = _to_jnp(arr, dtype)
    elif tail.startswith("mlp."):
        which = parts[3].split("_")[0]  # gate/up/down
        mlp = dict(lp["mlp"])
        _set_linear(mlp, which, arr, dtype, is_bias)
        lp["mlp"] = mlp
    elif tail.startswith("self_attn."):
        sub = parts[3]
        if sub in ("q_proj", "k_proj", "v_proj", "o_proj", "a_proj", "b_proj", "g_proj"):
            _set_linear(lp, sub, arr, dtype, is_bias)
        elif sub == "A_log":
            lp["A_log"] = _to_jnp(arr, jnp.float32)
        elif sub == "dt_bias":
            lp["dt_bias"] = _to_jnp(arr, jnp.float32)
        elif sub == "o_norm":
            lp["o_norm"] = _to_jnp(arr, dtype)
        elif sub.endswith("_conv1d"):
            which = sub.split("_")[0]  # q/k/v
            if is_bias:
                lp[f"conv_{which}_b"] = _to_jnp(arr, dtype)
            else:
                # torch Conv1d [D, 1, W] -> [W, D]
                lp[f"conv_{which}_w"] = _to_jnp(arr[:, 0, :].T, dtype)
        else:
            return 0
    else:
        return 0
    return 1


def _load_visual_tensor(blocks, visual, merger, rest, arr, dtype) -> int:
    is_bias = rest.endswith(".bias")
    if rest == "patch_embed.proj.weight":
        # Conv3d [Dv, C, tp, p, p] with kernel==stride -> matmul [C*tp*p*p, Dv]
        visual["patch_embed"] = _to_jnp(arr.reshape(arr.shape[0], -1).T, dtype)
        return 1
    if rest == "merger.ln_q.weight":
        merger["ln_q"] = _to_jnp(arr, dtype)
        return 1
    if rest.startswith("merger.mlp."):
        which = "fc1" if rest.split(".")[2] == "0" else "fc2"
        _set_linear(merger, which, arr, dtype, is_bias)
        return 1
    if rest.startswith("blocks."):
        parts = rest.split(".")
        bp = blocks[int(parts[1])]
        tail = ".".join(parts[2:])
        if tail == "norm1.weight":
            bp["norm1"] = _to_jnp(arr, dtype)
        elif tail == "norm2.weight":
            bp["norm2"] = _to_jnp(arr, dtype)
        elif tail.startswith("attn.qkv"):
            _set_linear(bp, "qkv", arr, dtype, is_bias)
        elif tail.startswith("attn.proj"):
            _set_linear(bp, "proj", arr, dtype, is_bias)
        elif tail.startswith("mlp."):
            which = parts[3].split("_")[0]
            mlp = dict(bp["mlp"])
            _set_linear(mlp, which, arr, dtype, is_bias)
            bp["mlp"] = mlp
        else:
            return 0
        return 1
    return 0
