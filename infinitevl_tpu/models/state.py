"""Decoder inference state: the functional replacement for the reference's
StaticCachePrealloc (modeling_infinitevl.py:66-443).

The whole cache is one pytree of fixed-shape arrays threaded through jitted
step functions (and donated for in-place updates under XLA). Branched QA
"cache cloning" (demo_streaming_inference.py:111-160) degenerates to simply
reusing the old pytree value — functional state makes the snapshot free.

Layout (S = #SWA layers, L = #DeltaNet layers):
  swa_k, swa_v : [S, B, Hkv, cap, Dh]   ring KV, head-major so the Pallas
                 flash kernel streams (cap, Dh) tiles with no transposes on
                 the decode hot path; cap = window (128-aligned)
  delta_h      : [L, B, H, K, V] fp32   recurrent state (fp32: the reference
                 kernels emit fp32 final_state, fused_recurrent.py:140)
  conv_q/k/v   : [L, B, W, D*]          raw-input history for ShortConvolution
  cum_len      : int32 scalar           total tokens processed (cache_position)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import TextConfig

DecoderState = Dict[str, jax.Array]


def init_decoder_state(
    cfg: TextConfig, batch_size: int, dtype=jnp.bfloat16
) -> DecoderState:
    S = cfg.num_swa_layers
    L = cfg.num_linear_layers
    cap = cfg.swa_capacity
    B = batch_size
    Hkv = cfg.num_key_value_heads
    Dh = cfg.head_dim
    H = cfg.num_linear_heads
    K = cfg.linear_head_dim
    V = cfg.head_v_dim
    W = cfg.conv_size
    state = {
        "swa_k": jnp.zeros((S, B, Hkv, cap, Dh), dtype=dtype),
        "swa_v": jnp.zeros((S, B, Hkv, cap, Dh), dtype=dtype),
        "delta_h": jnp.zeros((L, B, H, K, V), dtype=jnp.float32),
        "conv_q": jnp.zeros((L, B, W, cfg.num_linear_heads * K), dtype=dtype),
        "conv_k": jnp.zeros((L, B, W, cfg.linear_key_dim), dtype=dtype),
        "conv_v": jnp.zeros((L, B, W, cfg.linear_value_dim), dtype=dtype),
        "cum_len": jnp.zeros((), dtype=jnp.int32),
    }
    M = cfg.num_mamba2_layers
    if M:
        # mamba2-converted models (models/convert.py): fused vkq conv history
        # + per-head SSM state [N=head_dim, P=head_dim]. The reference layer
        # never wires its cache (fla/layers/mamba2_new.py:252-254 returns
        # None); this makes converted models servable anyway. Keys exist only
        # when the config has mamba2 layers so the deployed state is unchanged.
        Ha = cfg.num_attention_heads
        Da = cfg.head_dim
        state["mamba_conv"] = jnp.zeros((M, B, W, 3 * Ha * Da), dtype=dtype)
        state["mamba_h"] = jnp.zeros((M, B, Ha, Da, Da), dtype=jnp.float32)
    return state


def state_bytes(state: DecoderState) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(state))


def clone_state(state: DecoderState) -> DecoderState:
    """Explicit deep copy. Only needed when the caller intends to donate one
    branch's buffers; plain branching can just reuse the pytree value."""
    return jax.tree.map(jnp.copy, state)
