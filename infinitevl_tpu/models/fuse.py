"""Inference-time projection fusion: one MXU op per projection group.

Concatenating a layer's input projections along the OUTPUT dimension turns
the group into a single large matmul whose column slices reproduce the
unfused outputs bit-exactly (the contraction dimension and accumulation
order per output element are unchanged).

**Measured SLOWER on TPU v5e — OFF by default.** A/B at InfiniteVL-3B dims
(T=257 frame step / T=1 decode @500K, params as runtime args, slope-timed):

    group   frame ms   decode ms/tok
    none      29.35       11.407
    qkv       29.80       11.368
    delta     31.22       11.817
    mlp       33.79       11.456

XLA already pipelines the separate dots back-to-back while prefetching the
next weight tensor; the wide fused matmul tiles worse (and the DeltaNet
variant's 16-wide a/b column slices are lane-unaligned). Kept as an opt-in
(`fuse=True` on StreamingEngine/Generator) because the trade-off is
shape-dependent: re-measure on other topologies/batch sizes before use.

Fused groups (names the forward paths in models/text.py / models/vision.py
look for):

- SWA layer:      q/k/v            -> ``qkv_proj``   [D, (Hq+2*Hkv)*Dh]
- DeltaNet layer: q/k/v/a/b/g      -> ``fused_proj`` [D, 2*HK + VD + 2*H + HV]
- every SwiGLU MLP: gate/up        -> ``gate_up``    [D, 2*I]
- ViT blocks: qkv is already fused by construction; the MLP fuses as above.

This is a single-chip inference optimization: training, LoRA, checkpoint
I/O, and TP sharding rules all keep the unfused layout (q/k/v shard by
head groups that a concatenated kernel would interleave). Apply it to a
loaded/initialized tree right before building an inference engine.

Reference parity note: the reference keeps the projections separate
(modeling_infinitevl.py:996-1004 SWA, :1131-1164 DeltaNet) because torch
checkpoints store them separately; the math is identical.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..config import InfiniteVLConfig

Params = Dict[str, Any]


def _fuse_group(layer: Params, names, out_key: str) -> Params:
    """Concat the named linear sub-dicts along the output dim (idempotent)."""
    if out_key in layer or any(n not in layer for n in names):
        return layer
    kernels = [layer[n]["kernel"] for n in names]
    fused = {"kernel": jnp.concatenate(kernels, axis=1)}
    if any("bias" in layer[n] for n in names):
        fused["bias"] = jnp.concatenate(
            [
                layer[n].get(
                    "bias",
                    jnp.zeros(
                        (layer[n]["kernel"].shape[1],),
                        layer[n]["kernel"].dtype,
                    ),
                )
                for n in names
            ]
        )
    new = {k: v for k, v in layer.items() if k not in names}
    new[out_key] = fused
    return new


def _fuse_mlp(mlp: Params) -> Params:
    if "gate" in mlp and "up" in mlp:
        return _fuse_group(mlp, ("gate", "up"), "gate_up")
    return mlp


ALL_GROUPS = frozenset({"qkv", "delta", "mlp"})


def _fuse_text_layer(layer: Params, groups=ALL_GROUPS) -> Params:
    if "conv_q_w" in layer:  # DeltaNet flavor
        if "delta" in groups:
            layer = _fuse_group(
                layer,
                ("q_proj", "k_proj", "v_proj", "a_proj", "b_proj", "g_proj"),
                "fused_proj",
            )
    elif "conv_w" in layer:  # Mamba2 flavor: training-only mixer, keep as-is
        pass
    elif "q_proj" in layer and "qkv" in groups:  # SWA / full-attention flavor
        layer = _fuse_group(layer, ("q_proj", "k_proj", "v_proj"), "qkv_proj")
    if "mlp" in layer and "mlp" in groups:
        layer = dict(layer)
        layer["mlp"] = _fuse_mlp(layer["mlp"])
    return layer


def fuse_projections(
    params: Params,
    cfg: InfiniteVLConfig | None = None,
    groups=ALL_GROUPS,
) -> Params:
    """Return a new params tree with per-layer projection groups fused.

    `groups` ⊆ {"qkv", "delta", "mlp"} selects which fusion kinds apply.
    Accepts the full {'text', 'visual'} tree or a bare text tree. The
    input tree is not mutated; fused kernels are new arrays, so drop the
    original tree afterwards to reclaim HBM.
    """
    del cfg  # layer flavor is detected structurally
    groups = frozenset(groups)
    out = dict(params)
    text = params.get("text", params if "layers" in params else None)
    if text is not None:
        new_text = dict(text)
        new_text["layers"] = [
            _fuse_text_layer(lp, groups) for lp in text["layers"]
        ]
        if "text" in params:
            out["text"] = new_text
        else:
            out = new_text
    if "visual" in params and "mlp" in groups:
        vis = dict(params["visual"])
        vis["blocks"] = [
            {**b, "mlp": _fuse_mlp(b["mlp"])} for b in vis["blocks"]
        ]
        out["visual"] = vis
    return out


def is_fused(params: Params) -> bool:
    text = params.get("text", params)
    layers = text.get("layers", ())
    return any("qkv_proj" in lp or "fused_proj" in lp for lp in layers)
