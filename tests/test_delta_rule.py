"""Parity tests for the gated delta rule.

Methodology follows the reference's kernel-verification helpers
(fla/ops/utils/testing.py): relative-RMS error ratio against a ground-truth
implementation. Here the naive recurrence is itself validated against an
independent numpy step-by-step implementation, and the chunkwise form is
validated against the recurrence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu.ops.delta_rule import (
    delta_rule_chunk,
    delta_rule_recurrent,
    delta_rule_step,
)


def err_ratio(x, ref):
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    return np.abs(x - ref).mean() / (np.abs(ref).mean() + 1e-12)


def numpy_gated_delta(q, k, v, g, beta, s0, scale, l2norm_qk=True):
    """Independent step-by-step reference (float64)."""
    q, k, v, g, beta = (np.asarray(a, dtype=np.float64) for a in (q, k, v, g, beta))
    if l2norm_qk:
        q = q / np.sqrt((q**2).sum(-1, keepdims=True) + 1e-6)
        k = k / np.sqrt((k**2).sum(-1, keepdims=True) + 1e-6)
    B, T, H, K = q.shape
    V = v.shape[-1]
    s = np.array(s0, dtype=np.float64).copy()
    o = np.zeros((B, T, H, V))
    for b in range(B):
        for h in range(H):
            S = s[b, h]  # [K, V]
            for t in range(T):
                S = S * np.exp(g[b, t, h])
                pred = k[b, t, h] @ S
                verr = beta[b, t, h] * (v[b, t, h] - pred)
                S = S + np.outer(k[b, t, h], verr)
                o[b, t, h] = (scale * q[b, t, h]) @ S
            s[b, h] = S
    return o, s


def make_inputs(key, B=2, T=37, H=3, K=16, V=32, with_state=True):
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, T, H, K), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (B, T, H, K), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (B, T, H, V), dtype=jnp.float32)
    # realistic decay magnitudes: g in [-3, 0)
    g = -3.0 * jax.random.uniform(ks[3], (B, T, H), dtype=jnp.float32)
    beta = jax.nn.sigmoid(jax.random.normal(ks[4], (B, T, H)))
    s0 = (
        jax.random.normal(ks[5], (B, H, K, V), dtype=jnp.float32)
        if with_state
        else jnp.zeros((B, H, K, V), jnp.float32)
    )
    return q, k, v, g, beta, s0


def test_recurrent_matches_numpy():
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(0))
    scale = q.shape[-1] ** -0.5
    o_ref, s_ref = numpy_gated_delta(q, k, v, g, beta, s0, scale)
    o, s = delta_rule_recurrent(q, k, v, g, beta, initial_state=s0)
    assert err_ratio(o, o_ref) < 1e-5
    assert err_ratio(s, s_ref) < 1e-5


@pytest.mark.parametrize("chunk_size", [8, 16, 64])
@pytest.mark.parametrize("T", [1, 7, 16, 37, 128])
def test_chunk_matches_recurrent(chunk_size, T):
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(1), T=T)
    o_ref, s_ref = delta_rule_recurrent(q, k, v, g, beta, initial_state=s0)
    o, s = delta_rule_chunk(
        q, k, v, g, beta, initial_state=s0, chunk_size=chunk_size
    )
    assert err_ratio(o, o_ref) < 2e-4
    assert err_ratio(s, s_ref) < 2e-4


def test_chunk_no_initial_state():
    q, k, v, g, beta, _ = make_inputs(jax.random.PRNGKey(2), with_state=False)
    o_ref, s_ref = delta_rule_recurrent(q, k, v, g, beta)
    o, s = delta_rule_chunk(q, k, v, g, beta, chunk_size=16)
    assert err_ratio(o, o_ref) < 2e-4
    assert err_ratio(s, s_ref) < 2e-4


def test_state_composition():
    """chunk(T) == chunk(T/2) then chunk(T/2) with carried state."""
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(3), T=64)
    o_full, s_full = delta_rule_chunk(
        q, k, v, g, beta, initial_state=s0, chunk_size=16
    )
    half = 32
    o1, s1 = delta_rule_chunk(
        q[:, :half], k[:, :half], v[:, :half], g[:, :half], beta[:, :half],
        initial_state=s0, chunk_size=16,
    )
    o2, s2 = delta_rule_chunk(
        q[:, half:], k[:, half:], v[:, half:], g[:, half:], beta[:, half:],
        initial_state=s1, chunk_size=16,
    )
    assert err_ratio(jnp.concatenate([o1, o2], axis=1), o_full) < 2e-4
    assert err_ratio(s2, s_full) < 2e-4


def test_step_matches_recurrent():
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(4), T=5)
    o_ref, s_ref = delta_rule_recurrent(q, k, v, g, beta, initial_state=s0)
    s = s0
    outs = []
    for t in range(q.shape[1]):
        o_t, s = delta_rule_step(
            q[:, t], k[:, t], v[:, t], g[:, t], beta[:, t], s
        )
        outs.append(o_t)
    o = jnp.stack(outs, axis=1)
    assert err_ratio(o, o_ref) < 1e-5
    assert err_ratio(s, s_ref) < 1e-5


def test_segment_ids_reset_state():
    """Packed sequences must behave as independently-processed sequences."""
    key = jax.random.PRNGKey(5)
    B, T1, T2, H, K, V = 1, 19, 14, 2, 16, 32
    q, k, v, g, beta, _ = make_inputs(key, B=B, T=T1 + T2, H=H, K=K, V=V,
                                      with_state=False)
    seg = jnp.concatenate(
        [jnp.zeros((B, T1), jnp.int32), jnp.ones((B, T2), jnp.int32)], axis=1
    )
    o_packed, s_packed = delta_rule_chunk(
        q, k, v, g, beta, chunk_size=8, segment_ids=seg
    )
    o1, _ = delta_rule_recurrent(q[:, :T1], k[:, :T1], v[:, :T1],
                                 g[:, :T1], beta[:, :T1])
    o2, s2 = delta_rule_recurrent(q[:, T1:], k[:, T1:], v[:, T1:],
                                  g[:, T1:], beta[:, T1:])
    o_ref = jnp.concatenate([o1, o2], axis=1)
    assert err_ratio(o_packed, o_ref) < 2e-4
    assert err_ratio(s_packed, s2) < 2e-4


def test_bfloat16_inputs():
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(6), T=64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    o_ref, s_ref = delta_rule_recurrent(qb, kb, vb, g, beta, initial_state=s0)
    o, s = delta_rule_chunk(qb, kb, vb, g, beta, initial_state=s0, chunk_size=16)
    assert o.dtype == jnp.bfloat16
    assert s.dtype == jnp.float32
    assert err_ratio(o.astype(jnp.float32), o_ref.astype(jnp.float32)) < 2e-2
    assert err_ratio(s, s_ref) < 2e-2


@pytest.mark.parametrize("with_seg", [False, True])
def test_streamed_matches_vectorized(with_seg):
    """stream=True is the same math in a different evaluation order: outputs
    and state must match the vectorized path to fp32 tolerance."""
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(8), T=96)
    seg = None
    s0_arg = s0
    if with_seg:
        seg = jnp.concatenate(
            [jnp.zeros((2, 40), jnp.int32), jnp.ones((2, 56), jnp.int32)],
            axis=1,
        )
        s0_arg = None
    o_vec, s_vec = delta_rule_chunk(
        q, k, v, g, beta, initial_state=s0_arg, chunk_size=16,
        segment_ids=seg, stream=False,
    )
    o_st, s_st = delta_rule_chunk(
        q, k, v, g, beta, initial_state=s0_arg, chunk_size=16,
        segment_ids=seg, stream=True,
    )
    assert err_ratio(o_st, o_vec) < 1e-6
    assert err_ratio(s_st, s_vec) < 1e-6


@pytest.mark.parametrize("with_seg", [False, True])
def test_streamed_grads_match_vectorized(with_seg):
    """Gradient exactness: the checkpointed streamed backward must agree
    with the vectorized backward on every input."""
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(9), T=80)
    seg = (
        jnp.concatenate(
            [jnp.zeros((2, 30), jnp.int32), jnp.ones((2, 50), jnp.int32)],
            axis=1,
        )
        if with_seg
        else None
    )

    def loss(stream, q, k, v, g, beta):
        o, s = delta_rule_chunk(
            q, k, v, g, beta, initial_state=s0, chunk_size=16,
            segment_ids=seg, stream=stream,
        )
        return jnp.sum(jnp.sin(o)) + jnp.sum(s**2)

    g_vec = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3, 4))(
        q, k, v, g, beta
    )
    g_st = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3, 4))(
        q, k, v, g, beta
    )
    for a, b in zip(g_vec, g_st):
        assert err_ratio(b, a) < 1e-5


def test_streamed_bfloat16_dtype():
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(10), T=64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    o, s = delta_rule_chunk(
        qb, kb, vb, g, beta, initial_state=s0, chunk_size=16, stream=True
    )
    assert o.dtype == jnp.bfloat16
    assert s.dtype == jnp.float32
    o_ref, s_ref = delta_rule_recurrent(qb, kb, vb, g, beta, initial_state=s0)
    assert err_ratio(o.astype(jnp.float32), o_ref.astype(jnp.float32)) < 2e-2
    assert err_ratio(s, s_ref) < 2e-2


def test_chunk_differentiable():
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(7), T=32)

    def loss(q, k, v, g, beta):
        o, s = delta_rule_chunk(q, k, v, g, beta, initial_state=s0, chunk_size=8)
        return jnp.sum(o**2) + jnp.sum(s**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, g, beta)
    for gr in grads:
        assert jnp.all(jnp.isfinite(gr))

    # finite-difference check on a single coordinate of g
    eps = 1e-3
    gp = g.at[0, 3, 1].add(eps)
    gm = g.at[0, 3, 1].add(-eps)
    fd = (loss(q, k, v, gp, beta) - loss(q, k, v, gm, beta)) / (2 * eps)
    assert abs(float(grads[3][0, 3, 1]) - float(fd)) < 5e-2 * (abs(float(fd)) + 1)


@pytest.mark.parametrize("stream", [False, True])
def test_segment_boundary_at_chunk_edge(stream):
    """Regression (round 3): a packed-segment boundary landing EXACTLY on a
    chunk_size multiple used to leak the previous segment's state (the
    within-chunk masks see a single-segment chunk and keep the carry)."""
    B, T, H, K, V = 1, 32, 2, 8, 16
    q, k, v, g, beta, _ = make_inputs(
        jax.random.PRNGKey(11), B=B, T=T, H=H, K=K, V=V, with_state=False
    )
    seg = jnp.asarray([[0] * 16 + [1] * 16], jnp.int32)
    o1, _ = delta_rule_recurrent(q[:, :16], k[:, :16], v[:, :16],
                                 g[:, :16], beta[:, :16])
    o2, s2 = delta_rule_recurrent(q[:, 16:], k[:, 16:], v[:, 16:],
                                  g[:, 16:], beta[:, 16:])
    gt = jnp.concatenate([o1, o2], axis=1)
    o, s = delta_rule_chunk(
        q, k, v, g, beta, chunk_size=8, segment_ids=seg, stream=stream
    )
    assert err_ratio(o, gt) < 2e-4
    assert err_ratio(s, s2) < 2e-4


def test_bfloat16_compute_vs_fp32_compute():
    """The half-precision-operand chunk path (bf16 storage of w/u/attn and
    bf16-operand Newton-Schulz with fp32 accumulation — the reference
    Triton kernels' precision model) must track the fp32-compute result on
    the SAME bf16 values: casting the inputs to fp32 routes the identical
    numbers through the fp32 branch, so the difference isolates the new
    half-precision compute. Model-scale chunk (C=64 -> 5 NS iterations)."""
    q, k, v, g, beta, s0 = make_inputs(jax.random.PRNGKey(11), T=256)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    seg = jnp.concatenate(
        [jnp.zeros((2, 100), jnp.int32), jnp.ones((2, 156), jnp.int32)],
        axis=1,
    )
    o_bf, s_bf = delta_rule_chunk(
        qb, kb, vb, g, beta, chunk_size=64, segment_ids=seg
    )
    o_fp, s_fp = delta_rule_chunk(
        qb.astype(jnp.float32), kb.astype(jnp.float32),
        vb.astype(jnp.float32), g, beta, chunk_size=64, segment_ids=seg,
    )
    assert o_bf.dtype == jnp.bfloat16 and o_fp.dtype == jnp.float32
    assert err_ratio(o_bf.astype(jnp.float32), o_fp) < 2e-2
    assert err_ratio(s_bf, s_fp) < 2e-2
