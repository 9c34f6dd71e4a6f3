"""Depthwise causal short convolution (kernel size ~4) with SiLU.

Replaces the reference's causal-conv1d CUDA dependency
(fla/modules/convolution.py:128-297). On TPU a k=4 depthwise conv is just a
handful of shifted vector FMAs, which XLA fuses with the surrounding
projections — no custom kernel needed.

State layout: [B, W, D] (time-major, slot W-1 = most recent input, raw
pre-activation values), the transpose of the reference's [B, D, W].

Reference semantics replicated exactly:
- Multi-token path: output is the zero-left-padded causal conv of the current
  inputs only — the cached history is NOT used as left context
  (fla/modules/convolution.py:236-258 never feeds `cache` into
  `causal_conv1d_fn`). Pass `carry_history=True` for the corrected behavior.
- The new state is the last W raw inputs of the concatenated
  (previous state, current inputs) stream.
- Single-step path: roll state left, append input, convolve over the state
  (fla/modules/convolution.py:268-293).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .norms import silu


def causal_conv1d(
    x: jax.Array,  # [B, T, D]
    weight: jax.Array,  # [W, D] (time-major taps; tap W-1 hits the current token)
    bias: Optional[jax.Array] = None,  # [D]
    activation: str = "silu",
    initial_state: Optional[jax.Array] = None,  # [B, W, D]; used as left context
    segment_ids: Optional[jax.Array] = None,  # [B, T]; packing boundaries
    initial_state_segment_ids: Optional[jax.Array] = None,  # [B, W-1]
) -> jax.Array:
    """Depthwise causal convolution over time.

    y[t] = sum_{i=0..W-1} w[i] * x[t - (W - 1 - i)], zero-padded (or padded
    with the tail of `initial_state` when provided).

    With `segment_ids`, taps that would read across a packed-segment
    boundary contribute zero (the varlen masking causal-conv1d does with
    cu_seqlens in the reference's CUDA kernel). The left context defaults to
    segment -1 (never visible); sequence-chunked exact evaluation
    (models/text.delta_forward_seq_chunked) passes the history's true
    segment ids via `initial_state_segment_ids` so a segment spanning the
    chunk edge keeps its conv context."""
    B, T, D = x.shape
    W = weight.shape[0]
    if initial_state is not None:
        left = initial_state[:, 1:, :]  # last W-1 raw inputs
    else:
        left = jnp.zeros((B, W - 1, D), dtype=x.dtype)
    xp = jnp.concatenate([left, x], axis=1)  # [B, T + W - 1, D]
    segp = None
    if segment_ids is not None:
        if initial_state_segment_ids is not None:
            left_seg = initial_state_segment_ids.astype(segment_ids.dtype)
        else:
            # left context (zeros or cached history) never matches any segment
            left_seg = jnp.full((B, W - 1), -1, dtype=segment_ids.dtype)
        segp = jnp.concatenate([left_seg, segment_ids], axis=1)
    acc = jnp.zeros((B, T, D), dtype=jnp.float32)
    for i in range(W):
        tap = xp[:, i : i + T, :].astype(jnp.float32)
        if segp is not None and i < W - 1:
            same = (segp[:, i : i + T] == segment_ids).astype(jnp.float32)
            tap = tap * same[..., None]
        acc = acc + tap * weight[i].astype(jnp.float32)
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    if activation in ("silu", "swish"):
        acc = silu(acc)
    elif activation is not None and activation != "none":
        raise ValueError(f"unsupported activation {activation!r}")
    return acc.astype(x.dtype)


def conv_state_update(
    state: jax.Array,  # [B, W, D] previous raw-input history
    x: jax.Array,  # [B, T, D] new raw inputs
) -> jax.Array:
    """New state = last W entries of concat(state, x) along time."""
    W = state.shape[1]
    T = x.shape[1]
    if T >= W:
        return x[:, T - W :, :]
    return jnp.concatenate([state[:, T:, :], x], axis=1)


def short_conv(
    x: jax.Array,  # [B, T, D] raw projections
    weight: jax.Array,  # [W, D]
    bias: Optional[jax.Array],
    state: Optional[jax.Array],  # [B, W, D] or None
    activation: str = "silu",
    carry_history: bool = False,
    segment_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Multi-token short convolution, returning (output, new_state).

    new_state is None when `state` is None (stateless/training use)."""
    init = state if (carry_history and state is not None) else None
    y = causal_conv1d(
        x, weight, bias, activation, initial_state=init, segment_ids=segment_ids
    )
    new_state = conv_state_update(state, x) if state is not None else None
    return y, new_state


def short_conv_step(
    x: jax.Array,  # [B, D] single token
    weight: jax.Array,  # [W, D]
    bias: Optional[jax.Array],
    state: jax.Array,  # [B, W, D]
    activation: str = "silu",
) -> Tuple[jax.Array, jax.Array]:
    """Single-token decode step: shift history, convolve over it."""
    new_state = jnp.concatenate([state[:, 1:, :], x[:, None, :]], axis=1)
    y = jnp.sum(
        new_state.astype(jnp.float32) * weight.astype(jnp.float32)[None], axis=1
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation in ("silu", "swish"):
        y = silu(y)
    return y.astype(x.dtype), new_state
