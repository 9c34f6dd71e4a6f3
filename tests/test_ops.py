"""Tests for norms, short conv, rope, and SWA ring-buffer attention."""

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu.ops import (
    apply_rotary,
    attention_dense,
    causal_conv1d,
    l2norm,
    mrope_cos_sin,
    ring_slot_positions,
    rms_norm,
    rms_norm_gated,
    short_conv,
    short_conv_step,
    sliding_window_mask,
    swa_cached_attention,
    swa_prefill_dense,
)


def err_ratio(x, ref):
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    return np.abs(x - ref).mean() / (np.abs(ref).mean() + 1e-12)


# ---------------------------------------------------------------- norms


def test_rms_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    w = jnp.ones(8) * 2.0
    y = rms_norm(x, w, eps=1e-6)
    ref = x / np.sqrt((np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-6) * 2.0
    assert err_ratio(y, ref) < 1e-5


def test_rms_norm_gated_silu():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    g = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
    w = jnp.full((8,), 1.5)
    y = rms_norm_gated(x, g, w, eps=1e-5)
    xn = np.asarray(x) / np.sqrt(
        (np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-5
    )
    gn = np.asarray(g)
    ref = xn * 1.5 * gn / (1 + np.exp(-gn))
    assert err_ratio(y, ref) < 1e-5


def test_l2norm():
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 16))
    y = l2norm(x)
    n = np.linalg.norm(np.asarray(y), axis=-1)
    assert np.allclose(n, 1.0, atol=1e-4)


# ---------------------------------------------------------------- conv


def test_causal_conv_matches_numpy():
    B, T, D, W = 2, 10, 6, 4
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, D))
    w = jax.random.normal(jax.random.PRNGKey(5), (W, D)) * 0.5
    y = causal_conv1d(x, w, activation="none")
    xn, wn = np.asarray(x), np.asarray(w)
    ref = np.zeros((B, T, D))
    for t in range(T):
        for i in range(W):
            ti = t - (W - 1 - i)
            if ti >= 0:
                ref[:, t] += xn[:, ti] * wn[i]
    assert err_ratio(y, ref) < 1e-5


def test_conv_step_consistency():
    """Decode steps must continue a prefill exactly (with history carry)."""
    B, T, D, W = 1, 12, 4, 4
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, D))
    w = jax.random.normal(jax.random.PRNGKey(7), (W, D)) * 0.5
    state0 = jnp.zeros((B, W, D))
    # full-sequence conv (zero history == zero state carry)
    y_full = causal_conv1d(x, w, activation="silu")
    # prefill first 8, then step the remaining 4
    y_pre, state = short_conv(x[:, :8], w, None, state0, carry_history=True)
    outs = [y_pre]
    for t in range(8, T):
        y_t, state = short_conv_step(x[:, t], w, None, state)
        outs.append(y_t[:, None])
    y_steps = jnp.concatenate(outs, axis=1)
    assert err_ratio(y_steps, y_full) < 1e-5


def test_conv_reference_quirk_no_history():
    """Default multi-token path ignores conv history (reference parity,
    fla/modules/convolution.py:236-258)."""
    B, T, D, W = 1, 6, 4, 4
    x = jax.random.normal(jax.random.PRNGKey(8), (B, T, D))
    w = jax.random.normal(jax.random.PRNGKey(9), (W, D))
    state = jax.random.normal(jax.random.PRNGKey(10), (B, W, D))
    y, new_state = short_conv(x, w, None, state, carry_history=False)
    y_ref = causal_conv1d(x, w, activation="silu")
    assert err_ratio(y, y_ref) < 1e-6
    # state = last W raw inputs
    assert err_ratio(new_state, x[:, T - W :]) < 1e-6


# ---------------------------------------------------------------- rope


def test_mrope_text_only_matches_1d_rope():
    """With t==h==w position rows, mRoPE must equal plain 1D RoPE."""
    head_dim, B, T, H = 16, 1, 6, 2
    section = (4, 2, 2)
    inv = jnp.asarray(1.0 / 10000 ** (np.arange(0, head_dim, 2) / head_dim))
    pos = jnp.arange(T, dtype=jnp.int32)[None, None, :].repeat(3, 0)
    cos, sin = mrope_cos_sin(pos, inv, section)
    # plain rope
    freqs = pos[0, 0][:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    assert err_ratio(cos[0], jnp.cos(emb)) < 1e-6
    q = jax.random.normal(jax.random.PRNGKey(11), (B, T, H, head_dim))
    k = jax.random.normal(jax.random.PRNGKey(12), (B, T, H, head_dim))
    q2, k2 = apply_rotary(q, k, cos, sin)
    assert q2.shape == q.shape and k2.shape == k.shape


def test_mrope_sections_select_axes():
    """Channels in each section must read their assigned axis' positions."""
    head_dim = 16
    section = (4, 2, 2)
    inv = jnp.ones(head_dim // 2)  # freq 1 everywhere: cos = cos(pos)
    pos = jnp.stack(
        [jnp.full((1, 1), 5), jnp.full((1, 1), 7), jnp.full((1, 1), 11)]
    ).astype(jnp.int32)
    cos, _ = mrope_cos_sin(pos, inv, section)
    c = np.asarray(cos)[0, 0]
    expect = np.concatenate(
        [
            np.full(4, np.cos(5.0)),
            np.full(2, np.cos(7.0)),
            np.full(2, np.cos(11.0)),
        ]
        * 2
    )
    assert np.allclose(c, expect, atol=1e-6)


# ---------------------------------------------------------------- SWA


def test_ring_slot_positions():
    cap = 5
    # cum_len=3: slots 0..2 hold tokens 0..2, others empty
    pos = ring_slot_positions(jnp.int32(3), cap)
    assert pos.tolist() == [0, 1, 2, -1, -1]
    # cum_len=7: token n lives at n % 5 -> slots hold [5, 6, 2, 3, 4]
    pos = ring_slot_positions(jnp.int32(7), cap)
    assert pos.tolist() == [5, 6, 2, 3, 4]
    pos = ring_slot_positions(jnp.int32(0), cap)
    assert pos.tolist() == [-1] * cap


def test_swa_cached_matches_dense_reference():
    """Streaming ring-buffer attention == dense attention over the full
    history with a sliding-window mask, fed in arbitrary step sizes."""
    B, Hq, Hkv, D, W = 1, 4, 2, 8, 6
    cap = W - 1
    total = 23
    key = jax.random.PRNGKey(13)
    qs = jax.random.normal(key, (B, total, Hq, D))
    ks = jax.random.normal(jax.random.PRNGKey(14), (B, total, Hkv, D))
    vs = jax.random.normal(jax.random.PRNGKey(15), (B, total, Hkv, D))

    # ground truth: full dense with window mask
    ref = swa_prefill_dense(qs, ks, vs, window=W)

    ring_k = jnp.zeros((B, Hkv, cap, D))
    ring_v = jnp.zeros((B, Hkv, cap, D))
    cum = jnp.int32(0)
    outs = []
    for step in [1, 4, 2, 7, 1, 1, 5, 2]:
        s, e = int(cum), int(cum) + step
        o, ring_k, ring_v = swa_cached_attention(
            qs[:, s:e], ks[:, s:e], vs[:, s:e], ring_k, ring_v, cum, window=W
        )
        outs.append(o)
        cum = cum + step
    out = jnp.concatenate(outs, axis=1)
    assert err_ratio(out, ref) < 1e-5


def test_swa_memory_is_constant():
    """Ring state shape is independent of how many tokens were processed."""
    B, Hkv, D, W = 1, 2, 8, 6
    cap = W - 1
    ring_k = jnp.zeros((B, Hkv, cap, D))
    ring_v = jnp.zeros((B, Hkv, cap, D))
    cum = jnp.int32(0)
    q = jax.random.normal(jax.random.PRNGKey(16), (B, 3, 4, D))
    k = jax.random.normal(jax.random.PRNGKey(17), (B, 3, Hkv, D))
    v = jax.random.normal(jax.random.PRNGKey(18), (B, 3, Hkv, D))
    for _ in range(10):
        _, ring_k, ring_v = swa_cached_attention(
            q, k, v, ring_k, ring_v, cum, window=W
        )
        cum = cum + 3
    assert ring_k.shape == (B, Hkv, cap, D)


def test_sliding_window_mask_semantics():
    m = sliding_window_mask(
        jnp.arange(4, dtype=jnp.int32) + 10, jnp.arange(14, dtype=jnp.int32), 3
    )
    m = np.asarray(m)
    # query at pos 10 sees keys 8, 9, 10
    assert m[0].nonzero()[0].tolist() == [8, 9, 10]
    assert m[3].nonzero()[0].tolist() == [11, 12, 13]


def test_attention_dense_gqa_matches_mha():
    """GQA with repeated KV equals MHA on the duplicated heads."""
    B, T, D = 1, 5, 8
    q = jax.random.normal(jax.random.PRNGKey(19), (B, T, 4, D))
    k = jax.random.normal(jax.random.PRNGKey(20), (B, T, 2, D))
    v = jax.random.normal(jax.random.PRNGKey(21), (B, T, 2, D))
    mask = jnp.tril(jnp.ones((T, T), bool))[None]
    out = attention_dense(q, k, v, mask)
    k_rep = jnp.repeat(k, 2, axis=2)
    v_rep = jnp.repeat(v, 2, axis=2)
    out_ref = attention_dense(q, k_rep, v_rep, mask)
    assert err_ratio(out, out_ref) < 1e-6


def test_unsupported_hidden_act_rejected():
    """The compute path implements exactly silu/swish (models/text.mlp_forward
    hardcodes SwiGLU); other activation names must raise at config time, not
    silently run silu."""
    import pytest

    from infinitevl_tpu.config import TextConfig, VisionConfig

    with pytest.raises(ValueError, match="hidden_act"):
        TextConfig(hidden_act="gelu_new")
    with pytest.raises(ValueError, match="hidden_act"):
        VisionConfig(hidden_act="relu")
    TextConfig(hidden_act="swish")  # alias accepted
