"""Rotary position embeddings: text mRoPE (3D) and vision 2D RoPE.

Semantics match the reference:
- mRoPE cos/sin table: modeling_infinitevl.py:949-984 (InfiniteVLRotaryEmbedding)
- mRoPE application with interleaved channel sections:
  modeling_infinitevl.py:896-930 (apply_multimodal_rotary_pos_emb)
- Vision per-patch (h, w) rotary: modeling_infinitevl.py:491-502,741-768

The mRoPE section shuffle is folded into a single static gather index so the
per-step work is one gather + the usual rotate-half math (all fusible by XLA).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def default_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    return 1.0 / theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)


def rope_init(cfg, seq_len: int | None = None) -> Tuple[np.ndarray, float]:
    """(inv_freq, attention_scaling) for a TextConfig, honoring its rope
    scaling variant. Mirrors the transformers ROPE_INIT_FUNCTIONS the
    reference activates through model_utils/rope.py:35 (linear / dynamic /
    yarn / llama3); parity-tested against transformers in
    tests/test_rope_scaling.py. `seq_len` only affects "dynamic" (NTK
    recomputed when the running length exceeds max_position_embeddings)."""
    d = cfg.head_dim
    theta = cfg.rope_theta
    rt = cfg.rope_type
    factor = cfg.rope_factor
    base = default_inv_freq(d, theta)
    if rt == "default":
        return base, 1.0
    if rt == "linear":
        return base / factor, 1.0
    if rt == "dynamic":
        # dynamic NTK base rescale (transformers _compute_dynamic_ntk):
        # theta' = theta * ((factor * L / L_orig) - (factor - 1)) ** (d/(d-2)).
        # transformers recomputes this at runtime as seq_len grows; here
        # inv_freq is baked into params, so when configure_rope enlarged the
        # window it records the PRE-enlargement length in
        # rope_original_max_position_embeddings and we scale for the full
        # enlarged window at init. Without an original length this is the
        # transformers at-init identity (seq_len drives any rescale).
        L_orig = (
            cfg.rope_original_max_position_embeddings
            or cfg.max_position_embeddings
        )
        L = max(seq_len or cfg.max_position_embeddings, L_orig)
        new_theta = theta * (
            (factor * L / L_orig) - (factor - 1)
        ) ** (d / (d - 2))
        return default_inv_freq(d, new_theta), 1.0
    if rt == "yarn":
        orig = cfg.rope_original_max_position_embeddings or (
            cfg.max_position_embeddings // max(int(factor), 1)
        )
        beta_fast, beta_slow = cfg.rope_beta_fast, cfg.rope_beta_slow

        def find_dim(num_rot):
            return (
                d * np.log(orig / (num_rot * 2 * np.pi))
            ) / (2 * np.log(theta))

        low = max(int(np.floor(find_dim(beta_fast))), 0)
        high = min(int(np.ceil(find_dim(beta_slow))), d - 1)
        # linear ramp over rotary dims: 0 -> extrapolate (keep base freq),
        # 1 -> interpolate (base / factor)
        ramp = (np.arange(d // 2, dtype=np.float64) - low) / max(high - low, 1e-3)
        ramp = np.clip(ramp, 0.0, 1.0)
        inv_freq = (base / factor) * ramp + base * (1 - ramp)
        attention_scaling = 0.1 * float(np.log(factor)) + 1.0
        return inv_freq, attention_scaling
    if rt == "llama3":
        orig = cfg.rope_original_max_position_embeddings or 8192
        low_f, high_f = cfg.rope_low_freq_factor, cfg.rope_high_freq_factor
        low_wl = orig / low_f
        high_wl = orig / high_f
        wavelen = 2 * np.pi / base
        inv_llama = np.where(wavelen > low_wl, base / factor, base)
        smooth = (orig / wavelen - low_f) / (high_f - low_f)
        smoothed = (1 - smooth) * inv_llama / factor + smooth * inv_llama
        is_mid = (wavelen >= high_wl) & (wavelen <= low_wl)
        inv_freq = np.where(is_mid, smoothed, inv_llama)
        return inv_freq, 1.0
    raise ValueError(
        f"unknown rope_type {rt!r} (default | linear | dynamic | yarn | llama3)"
    )


@functools.lru_cache(maxsize=None)
def mrope_axis_index(head_dim: int, mrope_section: Tuple[int, ...]) -> np.ndarray:
    """For each channel of the full (duplicated) head_dim, which of the 3
    position axes (t/h/w) supplies its cos/sin.

    The reference splits the duplicated-channel cos into chunks of sizes
    mrope_section * 2 and takes chunk i from axis i % 3
    (modeling_infinitevl.py:925-930)."""
    sections = list(mrope_section) * 2
    assert sum(sections) == head_dim, (sections, head_dim)
    axis = np.concatenate(
        [np.full(s, i % 3, dtype=np.int32) for i, s in enumerate(sections)]
    )
    return axis


def mrope_cos_sin(
    position_ids: jax.Array,  # [3, B, T] (t/h/w rows)
    inv_freq: jax.Array,  # [head_dim // 2]
    mrope_section: Tuple[int, ...],
    attention_scaling: float = 1.0,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (cos, sin), each [B, T, head_dim], with the 3-axis interleaved
    section layout already applied, so downstream use is plain rotate-half."""
    pos = position_ids.astype(jnp.float32)  # [3, B, T]
    freqs = pos[..., None] * inv_freq.astype(jnp.float32)  # [3, B, T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [3, B, T, hd]
    head_dim = emb.shape[-1]
    axis = jnp.asarray(mrope_axis_index(head_dim, tuple(mrope_section)))
    chan = jnp.arange(head_dim)
    # Select, per channel, the axis' freq: emb[axis[c], :, :, c]
    emb_sel = emb[axis, :, :, chan]  # [hd, B, T]
    emb_sel = jnp.moveaxis(emb_sel, 0, -1)  # [B, T, hd]
    cos = jnp.cos(emb_sel) * attention_scaling
    sin = jnp.sin(emb_sel) * attention_scaling
    return cos.astype(dtype), sin.astype(dtype)


def apply_rotary(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, T, Hkv, D]
    cos: jax.Array,  # [B, T, D]
    sin: jax.Array,  # [B, T, D]
) -> Tuple[jax.Array, jax.Array]:
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    q_out = q * c + rotate_half(q) * s
    k_out = k * c + rotate_half(k) * s
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


# ---------------------------------------------------------------------------
# Vision 2D RoPE
# ---------------------------------------------------------------------------


def vision_rot_pos_ids(
    grid_thw: Sequence[Tuple[int, int, int]], spatial_merge_size: int
) -> np.ndarray:
    """Per-patch (h, w) position ids in merger-aware order.

    Host-side (numpy): grid shapes are static per bucket, so this runs once
    per shape and the result is a constant under jit. Mirrors the permutation
    in reference modeling_infinitevl.py:741-768."""
    m = spatial_merge_size
    out = []
    for t, h, w in grid_thw:
        hpos = np.arange(h)[:, None].repeat(w, axis=1)
        hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w)[None, :].repeat(h, axis=0)
        wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        ids = np.stack([hpos, wpos], axis=-1)
        out.append(np.tile(ids, (t, 1)))
    return np.concatenate(out, axis=0)  # [S, 2]


def vision_cos_sin(
    pos_ids: np.ndarray,  # [S, 2] (h, w)
    head_dim: int,
    theta: float = 10000.0,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin of shape [S, head_dim]: freqs for the (h, w) axes concatenated
    then duplicated (reference modeling_infinitevl.py:823,838-841).

    Pure numpy so it can run during jit tracing (plans are constants)."""
    inv_freq = default_inv_freq(head_dim // 2, theta)  # [head_dim/4]
    freqs = pos_ids[..., None].astype(np.float64) * inv_freq  # [S, 2, hd/4]
    freqs = freqs.reshape(freqs.shape[0], -1)  # [S, hd/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [S, hd]
    return np.cos(emb).astype(dtype), np.sin(emb).astype(dtype)


def apply_rotary_vision(
    q: jax.Array,  # [S, H, D]
    k: jax.Array,  # [S, H, D]
    cos: jax.Array,  # [S, D]
    sin: jax.Array,  # [S, D]
) -> Tuple[jax.Array, jax.Array]:
    """fp32 rotation, cast back (reference modeling_infinitevl.py:528-542)."""
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    c = cos[:, None, :].astype(jnp.float32)
    s = sin[:, None, :].astype(jnp.float32)
    q_out = qf * c + rotate_half(qf) * s
    k_out = kf * c + rotate_half(kf) * s
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
