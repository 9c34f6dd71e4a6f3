"""Gated delta rule: reference recurrence and chunkwise parallel form.

The per-token recurrence (semantics of the reference Triton kernel
fla/ops/gated_delta_rule/fused_recurrent.py:85-101), per head, state
S in R^{K x V} kept in float32:

    S      = exp(g_t) * S                       # gated decay
    v_eff  = beta_t * (v_t - k_t^T S)           # delta-rule error
    S      = S + outer(k_t, v_eff)
    o_t    = (scale * q_t)^T S

with q, k L2-normalized first (use_qk_l2norm_in_kernel=True at every call
site in the reference, modeling_infinitevl.py:1290-1316) and
scale = K^-0.5.

Chunkwise form (replaces fla/ops/gated_delta_rule/chunk.py:18-393): for a
chunk of length C with within-chunk cumulative log-decay g_i and
b_i = exp(g_i), the recurrence compresses to, per chunk,

    A[i,j]  = beta_i <k_i, k_j> exp(g_i - g_j)          (j < i)
    T       = (I + A)^{-1} @ diag(beta)                 (the "UT transform")
    W       = T @ (diag(b) K)      "w" in the reference wy_fast.py
    U       = T @ V                "u"
    Y       = U - W @ S                                 (pseudo-values)
    o       = diag(b) (scale Q) @ S + (tril(Q K^T) .* exp(g_i - g_j)) @ Y
    S_next  = exp(g_C) S + (K .* exp(g_C - g))^T @ Y

All decay factors appear as exp(g_i - g_j) with i >= j, hence bounded by 1;
state math is float32 throughout while Q/K/V stay in their input dtype for
the MXU matmuls. Verified token-exact (to fp32 tolerance) against the naive
recurrence in tests/test_delta_rule.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .norms import l2norm


def _solve_unit_lower(
    a: jax.Array, rhs: jax.Array, compute_dtype=jnp.float32
) -> jax.Array:
    """Solve (I + A) X = rhs for strictly-lower-triangular A.

    a: [..., C, C] strictly lower; rhs: [..., C, M].

    Newton-Schulz iteration X <- X (2I - L X): since the residual squares
    each step and E_0 = -A is nilpotent of index <= C, ceil(log2(C))
    iterations give the EXACT inverse — all batched MXU matmuls, far faster
    on TPU than lax.linalg.triangular_solve's sequential substitution.

    With a half-precision ``compute_dtype`` the iteration runs with
    half-precision OPERANDS and fp32 accumulation (the reference Triton
    kernels' precision model: tl.dot on bf16 tiles, fp32 acc —
    wy_fast.py stores its A/w/u tiles in input dtype). A is
    well-conditioned here (l2-normed k, decay ratios and beta all <= 1),
    so the fixed point sits at ~bf16 rounding of the exact inverse."""
    C = a.shape[-1]
    eye = jnp.eye(C, dtype=jnp.float32)
    n_iter = max(int(math.ceil(math.log2(max(C, 2)))) - 1, 0)
    if compute_dtype in (jnp.float32, jnp.float64):
        l = a.astype(jnp.float32) + eye
        x = eye - a.astype(jnp.float32)  # first-order seed: E_0 = A^2 terms
        for _ in range(n_iter):
            x = x @ (2.0 * eye - l @ x)
        return (x @ rhs.astype(jnp.float32)).astype(rhs.dtype)
    mm = functools.partial(
        jnp.einsum, "...ij,...jk->...ik",
        preferred_element_type=jnp.float32,
    )
    lb = (a.astype(jnp.float32) + eye).astype(compute_dtype)
    x = (eye - a.astype(jnp.float32)).astype(compute_dtype)
    for _ in range(n_iter):
        t = mm(lb, x)  # fp32
        x = mm(x, (2.0 * eye - t).astype(compute_dtype)).astype(compute_dtype)
    return mm(x, rhs.astype(compute_dtype)).astype(rhs.dtype)


def delta_rule_recurrent(
    q: jax.Array,  # [B, T, H, K]
    k: jax.Array,  # [B, T, H, K]
    v: jax.Array,  # [B, T, H, V]
    g: jax.Array,  # [B, T, H] log-decay (<= 0)
    beta: jax.Array,  # [B, T, H]
    initial_state: Optional[jax.Array] = None,  # [B, H, K, V] fp32
    scale: Optional[float] = None,
    use_qk_l2norm: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Naive sequential scan; the ground-truth semantics and the decode path.

    Returns (o [B, T, H, V] in v.dtype, final_state [B, H, K, V] fp32)."""
    B, T, H, K = q.shape
    V = v.shape[-1]
    if scale is None:
        scale = K**-0.5
    if use_qk_l2norm:
        q = l2norm(q)
        k = l2norm(k)
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)

    if initial_state is None:
        s0 = jnp.zeros((B, H, K, V), dtype=jnp.float32)
    else:
        s0 = initial_state.astype(jnp.float32)

    def step(s, inp):
        qt, kt, vt, gt, bt = inp  # [B,H,K],[B,H,K],[B,H,V],[B,H],[B,H]
        s = s * jnp.exp(gt)[..., None, None]
        pred = jnp.einsum("bhk,bhkv->bhv", kt, s)
        verr = (vt - pred) * bt[..., None]
        s = s + kt[..., :, None] * verr[..., None, :]
        ot = jnp.einsum("bhk,bhkv->bhv", qt, s)
        return s, ot

    xs = (
        jnp.moveaxis(qf, 1, 0),
        jnp.moveaxis(kf, 1, 0),
        jnp.moveaxis(vf, 1, 0),
        jnp.moveaxis(gf, 1, 0),
        jnp.moveaxis(bf, 1, 0),
    )
    s_final, o = jax.lax.scan(step, s0, xs)
    o = jnp.moveaxis(o, 0, 1)  # [B, T, H, V]
    return o.astype(v.dtype), s_final


def delta_rule_step(
    q: jax.Array,  # [B, H, K]
    k: jax.Array,
    v: jax.Array,  # [B, H, V]
    g: jax.Array,  # [B, H]
    beta: jax.Array,  # [B, H]
    state: jax.Array,  # [B, H, K, V] fp32
    scale: Optional[float] = None,
    use_qk_l2norm: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Single-token decode step (state-resident fast path)."""
    K = q.shape[-1]
    if scale is None:
        scale = K**-0.5
    if use_qk_l2norm:
        q = l2norm(q)
        k = l2norm(k)
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    eg = jnp.exp(g.astype(jnp.float32))  # [B, H]
    # one joint reduction reads the state ONCE for both q.h and k.h; the
    # output is then assembled algebraically:
    #   s1 = eg*s;  verr = beta*(v - k.s1);  s' = s1 + k (x) verr
    #   o  = q.s' = eg*(q.s) + (q.k)*verr
    # so the state is touched in exactly two passes (joint read + fused
    # decay/update read-write) instead of four — the decode step is
    # state-bandwidth-bound at B >= 8 (27 layers x B x 2.1 MB fp32)
    qk = jnp.stack([qf, kf], axis=2)  # [B, H, 2, K]
    red = jnp.einsum("bhsk,bhkv->bhsv", qk, state)  # [B, H, 2, V]
    qh, kh = red[:, :, 0], red[:, :, 1]
    verr = (vf - eg[..., None] * kh) * beta.astype(jnp.float32)[..., None]
    s = state * eg[..., None, None] + kf[..., :, None] * verr[..., None, :]
    qdotk = jnp.sum(qf * kf, axis=-1)  # [B, H]
    o = eg[..., None] * qh + qdotk[..., None] * verr
    return o.astype(v.dtype), s


def _wyut_precompute(
    qf: jax.Array,  # [..., C, K] compute dtype, already scaled
    kf: jax.Array,  # [..., C, K] compute dtype
    vf: jax.Array,  # [..., C, V] compute dtype
    gf: jax.Array,  # [..., C] fp32 log-decay (segment starts already zeroed)
    bf: jax.Array,  # [..., C] fp32 beta
    seg: Optional[jax.Array],  # [..., C] segment ids (head axis broadcast) or None
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, ...]:
    """Per-chunk WY/UT precompute, batch-dim agnostic.

    Works on a single chunk ([B, H, C, ·], the streamed scan body) or on all
    chunks at once ([B, H, N, C, ·], the vectorized path) — the chunkwise
    math of the reference pipeline (chunk.py:74-177 / wy_fast.py) is local
    to each chunk, so the two calls share this code exactly.

    ``compute_dtype`` is the storage dtype of the returned per-chunk
    tensors and the matmul operand dtype (accumulation stays fp32 via
    preferred_element_type). Callers pass the layer's input dtype: with
    bf16 models the vectorized path's [B, H, N, C, ·] tensors were the
    delta layer's HBM bottleneck at fp32 (measured ~10.5 ms/layer fwd at
    3B/8K, bandwidth-bound); bf16 storage halves that traffic and matches
    the reference Triton pipeline, which stores w/u/A tiles in input dtype
    (wy_fast.py). Decay/beta/carry math stays fp32.

    Returns (w, u, q_b, attn, k_out, carry)."""
    K = qf.shape[-1]
    C = qf.shape[-2]
    gcs = jnp.cumsum(gf, axis=-1)  # within-chunk inclusive cumsum [..., C]
    b_end = gcs[..., -1]  # [...]

    # Pairwise decay ratios within chunk: R[i, j] = exp(g_i - g_j), i >= j
    gi = gcs[..., :, None]
    gj = gcs[..., None, :]
    tril = jnp.tril(jnp.ones((C, C), dtype=bool))
    stril = jnp.tril(jnp.ones((C, C), dtype=bool), k=-1)
    ratio = jnp.where(tril, jnp.exp(jnp.minimum(gi - gj, 0.0)), 0.0)

    if seg is not None:
        first_of_chunk = seg[..., :1]
        last_of_chunk = seg[..., -1:]
        same_as_chunk_start = seg == first_of_chunk
        same_seg = seg[..., :, None] == seg[..., None, :]
        ratio = jnp.where(same_seg, ratio, 0.0)

    kk = jnp.einsum(
        "...ik,...jk->...ij", kf, kf, preferred_element_type=jnp.float32
    )  # [..., C, C] fp32
    a_mat = jnp.where(stril, kk * ratio, 0.0) * bf[..., :, None]
    # X = (I + A)^{-1} rhs, rhs stacked [diag(b) K | V] to solve once
    kb = kf.astype(jnp.float32) * jnp.exp(gcs)[..., None]
    if seg is not None:
        # decay-from-chunk-start only valid within first segment of chunk;
        # cross-segment state terms are masked below anyway, but keep kb finite
        kb = jnp.where(same_as_chunk_start[..., None], kb, 0.0)
    rhs = (
        jnp.concatenate([kb, vf.astype(jnp.float32)], axis=-1)
        * bf[..., None]
    ).astype(compute_dtype)
    x = _solve_unit_lower(a_mat, rhs, compute_dtype)
    w = x[..., :K]  # [..., C, K]
    u = x[..., K:]  # [..., C, V]

    # Output-side precomputables
    qk = jnp.einsum(
        "...ik,...jk->...ij", qf, kf, preferred_element_type=jnp.float32
    )
    attn = jnp.where(tril, qk * ratio, 0.0).astype(compute_dtype)  # incl. diag
    q_b = (
        qf.astype(jnp.float32) * jnp.exp(gcs)[..., None]
    )  # decay-weighted queries for inter term
    if seg is not None:
        q_b = jnp.where(same_as_chunk_start[..., None], q_b, 0.0)
    q_b = q_b.astype(compute_dtype)
    k_out = (
        kf.astype(jnp.float32) * jnp.exp(b_end[..., None] - gcs)[..., None]
    )  # decay-to-chunk-end
    carry = jnp.exp(b_end)  # [...] state decay across the chunk
    if seg is not None:
        # only the chunk's final segment carries state into the next chunk
        k_out = jnp.where((seg == last_of_chunk)[..., None], k_out, 0.0)
        # a segment boundary inside the chunk kills the incoming state carry
        carry = jnp.where((first_of_chunk == last_of_chunk)[..., 0], carry, 0.0)
    return w, u, q_b, attn, k_out.astype(compute_dtype), carry


def delta_rule_chunk(
    q: jax.Array,  # [B, T, H, K]
    k: jax.Array,
    v: jax.Array,  # [B, T, H, V]
    g: jax.Array,  # [B, T, H]
    beta: jax.Array,  # [B, T, H]
    initial_state: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_qk_l2norm: bool = True,
    chunk_size: int = 64,
    segment_ids: Optional[jax.Array] = None,  # [B, T] int32; see note
    stream: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Chunkwise-parallel gated delta rule (training / prefill path).

    Packing support: `segment_ids` marks independent sequences packed along
    T (the TPU-idiomatic replacement for the reference's cu_seqlens,
    chunk.py:211-214). State is reset at segment boundaries by zeroing the
    decay carry-over and masking cross-segment interactions. With segment
    ids present, `initial_state` seeds only the first segment.

    ``stream`` selects between two evaluation orders of the SAME math:

    - vectorized (False): the WY/UT precompute runs for all N chunks up
      front as [B, H, N, C, ·] tensors, then a light scan threads the state.
      Best wall-clock at small N (prefill chunks), but the backward holds
      every chunk's intermediates at once — ~4.5 GB fp32 per 3B delta layer
      at 32K, the round-2 long-context-OOM root cause.
    - streamed (True): the precompute runs inside a `jax.checkpoint`-wrapped
      scan body, so each chunk's intermediates exist only while that chunk
      is processed; the backward saves just the per-chunk carry states
      (N x [B, H, K, V] fp32, ~0.5 GB/layer at 32K) and recomputes the rest
      per chunk — the JAX expression of the reference kernel pipeline's
      streaming structure (chunk.py:74-177 never materializes all chunks).

    Gradients are exact either way (verified in tests/test_delta_rule.py).
    Default (None) streams at N >= 128 chunks, matching the model's
    delta_stream_min_chunks. Measured on v5e at 3B/8K after the
    bf16-intermediates change: which order wins depends on N — at C=64
    (N=128) streaming is FASTER (8.87 vs 10.64 ms/layer fwd; the
    checkpointed scan never materializes the [.., N, C, ·] tensors), while
    small-N prefill chunks (N <= 64) favor the vectorized batching. Both
    paths are HBM-bound, not compute-bound, at these shapes.
    """
    B, T, H, K = q.shape
    V = v.shape[-1]
    C = chunk_size
    if scale is None:
        scale = K**-0.5
    if use_qk_l2norm:
        q = l2norm(q)
        k = l2norm(k)

    is_start = None
    if segment_ids is not None:
        # Token t starts a new packed sequence iff its segment id differs
        # from token t-1's. Token 0 continues from initial_state.
        is_start = jnp.concatenate(
            [
                jnp.zeros((B, 1), dtype=bool),
                segment_ids[:, 1:] != segment_ids[:, :-1],
            ],
            axis=1,
        )

    pad = (-T) % C
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        beta = jnp.pad(beta, ((0, 0), (0, pad), (0, 0)))
        if segment_ids is not None:
            # pad tokens continue the last segment; beta=0 makes them inert
            segment_ids = jnp.pad(segment_ids, ((0, 0), (0, pad)), mode="edge")
            is_start = jnp.pad(is_start, ((0, 0), (0, pad)))
    Tp = T + pad
    N = Tp // C

    # [B, N, C, H, *] chunked views, head-major for matmuls: [B, H, N, C, *]
    def chunked(x, d):
        x = x.reshape(B, N, C, H, d) if d else x.reshape(B, N, C, H)
        return jnp.moveaxis(x, 3, 1)  # [B, H, N, C, (d)]

    if stream is None:
        stream = N >= 128

    gf_all = chunked(g, 0).astype(jnp.float32)  # [B, H, N, C]
    bf_all = chunked(beta, 0).astype(jnp.float32)
    if segment_ids is not None:
        seg = segment_ids.reshape(B, 1, N, C)
        # decay resets at segment start: zero g on the first token of a segment
        starts_c = is_start.reshape(B, 1, N, C)
        gf_all = jnp.where(starts_c, 0.0, gf_all)
        # a segment boundary EXACTLY at a chunk edge: the within-chunk masks
        # can't see it (the whole chunk shares one segment), so the incoming
        # state must be severed explicitly per chunk [B, N]
        edge_start = is_start.reshape(B, N, C)[:, :, 0].astype(jnp.float32)
    else:
        seg = None
        edge_start = None

    if initial_state is None:
        s0 = jnp.zeros((B, H, K, V), dtype=jnp.float32)
    else:
        s0 = initial_state.astype(jnp.float32)

    # matmul-operand / per-chunk-tensor storage dtype: the input dtype
    # (fp32 paths stay bit-identical; bf16 models halve the dominant HBM
    # traffic and ride the MXU at full rate — accumulation is fp32 via
    # preferred_element_type everywhere, the reference Triton precision)
    cd = v.dtype if v.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
    if not stream:
        qf = (chunked(q, K).astype(jnp.float32) * scale).astype(cd)
        kf = chunked(k, K).astype(cd)
        vf = chunked(v, V).astype(cd)
        w, u, q_b, attn, k_out, carry = _wyut_precompute(
            qf, kf, vf, gf_all, bf_all, seg, cd
        )

        has_edge = edge_start is not None

        def chunk_step(s, inp):
            if has_edge:
                w_c, u_c, qb_c, attn_c, kout_c, carry_c, edge_c = inp
                s = s * (1.0 - edge_c)[:, None, None, None]
            else:
                w_c, u_c, qb_c, attn_c, kout_c, carry_c = inp
            sc = s.astype(cd)  # half-precision state READ for output math;
            # the state ACCUMULATOR itself stays fp32 across chunks
            y = (
                u_c.astype(jnp.float32)
                - jnp.einsum(
                    "bhck,bhkv->bhcv", w_c, sc,
                    preferred_element_type=jnp.float32,
                )
            ).astype(cd)
            o_inter = jnp.einsum(
                "bhck,bhkv->bhcv", qb_c, sc,
                preferred_element_type=jnp.float32,
            )
            o = o_inter + jnp.einsum(
                "bhij,bhjv->bhiv", attn_c, y,
                preferred_element_type=jnp.float32,
            )
            s_new = s * carry_c[..., None, None] + jnp.einsum(
                "bhck,bhcv->bhkv", kout_c, y,
                preferred_element_type=jnp.float32,
            )
            return s_new, o.astype(v.dtype)

        xs = tuple(
            jnp.moveaxis(t, 2, 0) for t in (w, u, q_b, attn, k_out, carry)
        )
        if has_edge:
            xs = xs + (jnp.moveaxis(edge_start, 1, 0),)
        s_final, o = jax.lax.scan(chunk_step, s0, xs)  # o: [N, B, H, C, V]
    else:
        # Streamed: q/k/v ride the scan in their INPUT dtype (an up-front
        # fp32 cast would double their residency); each chunk casts, runs
        # the full WY/UT precompute, and produces its output slice inside a
        # checkpointed body, so the backward stores only (state, chunk
        # inputs) per step and recomputes the intermediates chunk by chunk.
        qc = jnp.moveaxis(chunked(q, K), 2, 0)  # [N, B, H, C, K]
        kc = jnp.moveaxis(chunked(k, K), 2, 0)
        vc = jnp.moveaxis(chunked(v, V), 2, 0)
        gc = jnp.moveaxis(gf_all, 2, 0)  # [N, B, H, C] (fp32, starts zeroed)
        bc = jnp.moveaxis(bf_all, 2, 0)
        has_seg = seg is not None

        def chunk_body(s, inp):
            if has_seg:
                q_c, k_c, v_c, g_c, b_c, seg_c, edge_c = inp
                s = s * (1.0 - edge_c)[:, None, None, None]
            else:
                q_c, k_c, v_c, g_c, b_c = inp
                seg_c = None
            qf_c = (q_c.astype(jnp.float32) * scale).astype(cd)
            kf_c = k_c.astype(cd)
            vf_c = v_c.astype(cd)
            w_c, u_c, qb_c, attn_c, kout_c, carry_c = _wyut_precompute(
                qf_c, kf_c, vf_c, g_c, b_c, seg_c, cd
            )
            sc = s.astype(cd)
            y = (
                u_c.astype(jnp.float32)
                - jnp.einsum(
                    "bhck,bhkv->bhcv", w_c, sc,
                    preferred_element_type=jnp.float32,
                )
            ).astype(cd)
            o = jnp.einsum(
                "bhck,bhkv->bhcv", qb_c, sc,
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "bhij,bhjv->bhiv", attn_c, y,
                preferred_element_type=jnp.float32,
            )
            s_new = s * carry_c[..., None, None] + jnp.einsum(
                "bhck,bhcv->bhkv", kout_c, y,
                preferred_element_type=jnp.float32,
            )
            return s_new, o.astype(v.dtype)

        xs = (qc, kc, vc, gc, bc)
        if has_seg:
            xs = xs + (
                jnp.moveaxis(seg, 2, 0),
                jnp.moveaxis(edge_start, 1, 0),
            )
        s_final, o = jax.lax.scan(jax.checkpoint(chunk_body), s0, xs)

    o = jnp.moveaxis(o, 0, 2).reshape(B, H, Tp, V)[:, :, :T, :]
    o = jnp.moveaxis(o, 1, 2)  # [B, T, H, V]
    return o.astype(v.dtype), s_final


def gated_delta_rule(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    beta: jax.Array,
    initial_state: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_qk_l2norm: bool = True,
    chunk_size: int = 64,
    recurrent_threshold: int = 64,
    segment_ids: Optional[jax.Array] = None,
    mode: Optional[str] = None,
    stream: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dispatch: recurrent path for short inputs (T <= threshold, matching
    the reference's q_len <= 64 switch, modeling_infinitevl.py:1230), else
    chunkwise. `mode` in {"chunk", "recurrent"} forces a path."""
    T = q.shape[1]
    if mode is None:
        mode = "recurrent" if T <= recurrent_threshold else "chunk"
    if mode == "recurrent":
        if segment_ids is not None:
            raise ValueError("segment_ids only supported in chunk mode")
        return delta_rule_recurrent(
            q, k, v, g, beta, initial_state, scale, use_qk_l2norm
        )
    return delta_rule_chunk(
        q,
        k,
        v,
        g,
        beta,
        initial_state,
        scale,
        use_qk_l2norm,
        chunk_size,
        segment_ids,
        stream,
    )
