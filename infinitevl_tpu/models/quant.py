"""Weight-only int8 quantization for serving.

The B=1 decode floor on a v5e is the weight read: ~7.4 GB bf16 at 819 GB/s
= 9.0 ms/token (measured 10.6 ms end-to-end, BENCH_r02). Storing the large
projection matrices as int8 with per-output-channel scales halves the bytes
the decode step must stream; XLA fuses the int8->bf16 convert and the
per-column scale into the dot's operand read, so no dequantized copy ever
lands in HBM.

This is the TPU answer to the reference's CUDA-ecosystem quantized loading
(src/llamafactory/model/model_utils/quantization.py — GPTQ/AWQ/bnb are
kernel-specific and N/A here): same capability (serve a 3B in int8),
hardware-native mechanism.

Per-channel symmetric scheme: w[:, j] ~= q[:, j] * scale[j], q in [-127,
127], scale = max|w[:, j]| / 127. Matmul helpers (models/text._dense /
models/vision._dense) detect 'kernel_q' and compute
(x @ q.astype(x.dtype)) * scale — column scales commute with the
contraction, so this is exact dequant-then-matmul.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# Projections worth quantizing: the large 2D matmuls. Norm/conv/bias/rope
# leaves stay high precision (tiny), as do the embedding (gather reads only
# touched rows) unless quantize_embed is set (the tied lm_head matmul reads
# all vocab x hidden bytes every token).
DEFAULT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "a_proj", "b_proj", "g_proj",
    "gate", "up", "down", "dt_proj", "qkv", "proj", "fc1", "fc2",
    "gate_up", "qkv_proj", "fused_proj",
)


def quantize_kernel(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8: returns {'kernel_q', 'scale'}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)  # [d_out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale.astype(jnp.float32)}


def dequantize_kernel(node: Dict[str, jax.Array], dtype=jnp.bfloat16):
    return (
        node["kernel_q"].astype(jnp.float32) * node["scale"][None, :]
    ).astype(dtype)


def quantize_params(
    params: Params,
    targets: Sequence[str] = DEFAULT_TARGETS,
    min_size: int = 65536,
) -> Params:
    """Replace each targeted dense node's 'kernel' with int8 + scale.

    Structure-preserving otherwise; nodes smaller than `min_size` elements
    keep full precision (scales/overhead would dominate)."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in targets
                    and isinstance(v, dict)
                    and "kernel" in v
                    and getattr(v["kernel"], "ndim", 0) == 2
                    and v["kernel"].size >= min_size
                ):
                    new = {kk: vv for kk, vv in v.items() if kk != "kernel"}
                    new.update(quantize_kernel(v["kernel"]))
                    out[k] = new
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def quantized_bytes(params: Params) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
