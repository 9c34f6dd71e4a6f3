"""Hybrid SWA / Gated-DeltaNet text decoder.

Functional re-design of the reference decoder stack
(modeling_infinitevl.py:987-1591): parameters are a pytree, the inference
cache is a DecoderState pytree, and the layer loop is a plain Python loop
over per-layer parameter dicts (unrolled under jit so decode reads each
layer's weights exactly once — no stacked-slice copies on the hot path).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import FULL, LINEAR, MAMBA2, SLIDING, TextConfig
from ..ops.delta_rule import delta_rule_step, gated_delta_rule
from ..ops.norms import rms_norm, rms_norm_gated, silu
from ..ops.rope import apply_rotary, mrope_cos_sin
from ..ops.short_conv import short_conv, short_conv_step
from ..ops.swa import swa_cached_attention, swa_prefill_dense
from .state import DecoderState

Params = Dict[str, Any]


def _dense(x: jax.Array, p: Params) -> jax.Array:
    if "kernel_q" in p:
        # weight-only int8 (models/quant.py): XLA fuses the int8->x.dtype
        # convert into the dot's operand read; the column scale commutes
        # with the contraction, so this is exact dequant-then-matmul at
        # half the HBM bytes
        y = (x @ p["kernel_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
    elif "kernel_q4f" in p:
        # fused Pallas unpack-matmul (ops/int4_pallas.py) — opt-in rekey
        # (models/quant.prefer_fused_int4), measured SLOWER than the XLA
        # dual-dot path at B=1 decode (12.61 vs 10.62 ms/tok; kernel
        # docstring has the why). Never selected by default.
        from ..ops.int4_pallas import int4_matmul_fused

        y = int4_matmul_fused(x, p)
    elif "kernel_q4" in p or "kernel_q4b" in p:
        # weight-only int4, nibble-packed uint8 + group scales
        # (models/quant.int4_matmul): quarter the HBM bytes; the unpack is
        # elementwise on the dot operands so XLA fuses it into the read
        from .quant import int4_matmul

        y = int4_matmul(x, p)
    else:
        y = x @ p["kernel"]
    if "lora_a" in p:
        # low-rank side path (train/lora.attach_lora): keeps gradients and
        # intermediates rank-r sized instead of weight-shaped
        y = y + ((x @ p["lora_a"]) @ p["lora_b"]).astype(y.dtype)
    if "dora_scale" in p:
        # DoRA per-column magnitude rescale, applied pre-bias (peft
        # semantics): y = x @ (m * W_eff / ||W_eff||_col)
        y = y * p["dora_scale"].astype(y.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def mlp_forward(p: Params, x: jax.Array) -> jax.Array:
    """SwiGLU MLP (modeling_infinitevl.py:933-946).

    Accepts the fused ``gate_up`` layout produced by models/fuse.py."""
    if "gate_up" in p:
        gu = _dense(x, p["gate_up"])
        inter = gu.shape[-1] // 2
        return _dense(silu(gu[..., :inter]) * gu[..., inter:], p["down"])
    return _dense(silu(_dense(x, p["gate"])) * _dense(x, p["up"]), p["down"])


def mlp_forward_chunked(p: Params, x: jax.Array, chunk_t: int) -> jax.Array:
    """MLP over sequence chunks, each checkpointed: the SwiGLU backward
    holds ~3 [T, intermediate] temps (2 GB/layer at 3B/32K); chunking
    bounds them to the chunk length. Pointwise over T, so exact."""
    B, T, D = x.shape
    xc = x.reshape(B, T // chunk_t, chunk_t, D).swapaxes(0, 1)
    y = jax.lax.map(jax.checkpoint(lambda c: mlp_forward(p, c)), xc)
    return y.swapaxes(0, 1).reshape(B, T, D)


# ---------------------------------------------------------------------------
# SWA layer
# ---------------------------------------------------------------------------


def _use_pallas_swa(cfg: TextConfig, cap: int, head_dim: int) -> bool:
    if not cfg.use_pallas_swa:
        return False
    if jax.default_backend() != "tpu":
        return False
    return cap % 512 == 0 and head_dim % 128 == 0


def swa_attention_forward(
    p: Params,
    cfg: TextConfig,
    x: jax.Array,  # [B, T, D]
    cos: jax.Array,  # [B, T, head_dim]
    sin: jax.Array,
    rings_k: Optional[jax.Array],  # [S, B, Hkv, cap, Dh] STACKED rings or None
    rings_v: Optional[jax.Array],
    cum_len: Optional[jax.Array],
    layer_idx: int = 0,  # static index into the ring stack
    segment_ids: Optional[jax.Array] = None,
    window: Optional[int] = None,
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Reference InfiniteVLSelfAttention (modeling_infinitevl.py:987-1113):
    GQA with qkv bias, mRoPE, sliding-window mask, no o_proj bias.

    Cached calls take the STACKED ring arrays plus a static layer index and
    return the updated stacks: per-layer slice->update->stack-write round
    trips cost full ring copies under XLA (measured 2.4 ms/step at B=8),
    while direct stacked writes are near-free (0.26 ms)."""
    B, T, _ = x.shape
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    window = window if window is not None else cfg.sliding_window
    if (
        rings_k is None
        and "q_proj" in p
        and cfg.delta_seq_chunk_t
        and T >= 2 * window
        and T > cfg.delta_seq_chunk_t
    ):
        # long stateless (training) forward: whole layer in window-sized
        # sequence chunks (see swa_forward_seq_chunked). Gated by the same
        # absolute threshold as the delta layers so short-T (tests, frame
        # steps, tiny windows) keep the single-call path.
        out = swa_forward_seq_chunked(
            p, cfg, x, cos, sin, segment_ids, window
        )
        return out, None, None
    if "qkv_proj" in p:  # fused layout (models/fuse.py): one matmul
        qkv = _dense(x, p["qkv_proj"])
        nq, nk = Hq * Dh, Hkv * Dh
        q = qkv[..., :nq].reshape(B, T, Hq, Dh)
        k = qkv[..., nq : nq + nk].reshape(B, T, Hkv, Dh)
        v = qkv[..., nq + nk :].reshape(B, T, Hkv, Dh)
    else:
        q = _dense(x, p["q_proj"]).reshape(B, T, Hq, Dh)
        k = _dense(x, p["k_proj"]).reshape(B, T, Hkv, Dh)
        v = _dense(x, p["v_proj"]).reshape(B, T, Hkv, Dh)
    q, k = apply_rotary(q, k, cos, sin)
    if rings_k is None:
        out = swa_prefill_dense(q, k, v, window, segment_ids=segment_ids)
        new_rk = new_rv = None
    elif _use_pallas_swa(cfg, rings_k.shape[3], rings_k.shape[-1]):
        from ..ops.swa import ring_write_stacked
        from ..ops.swa_pallas import (
            swa_ring_flash_attention,
            swa_ring_flash_decode_stacked,
        )

        if T == 1:
            # write-then-attend over the ring alone: no concat/slice copies
            out, new_rk, new_rv = swa_ring_flash_decode_stacked(
                q, k, v, rings_k, rings_v, layer_idx, cum_len, window
            )
        else:
            out = swa_ring_flash_attention(
                q, k, v, rings_k[layer_idx], rings_v[layer_idx], cum_len,
                window,
            )
            new_rk, new_rv = ring_write_stacked(
                rings_k, rings_v, layer_idx, k, v, cum_len
            )
    else:
        from ..ops.swa import ring_write_stacked

        out, _, _ = swa_cached_attention(
            q, k, v, rings_k[layer_idx], rings_v[layer_idx], cum_len, window,
            write_ring=False,  # written once below, into the stacks
        )
        new_rk, new_rv = ring_write_stacked(
            rings_k, rings_v, layer_idx, k, v, cum_len
        )
    out = out.reshape(B, T, Hq * Dh)
    return _dense(out, p["o_proj"]), new_rk, new_rv


# ---------------------------------------------------------------------------
# Gated DeltaNet layer
# ---------------------------------------------------------------------------


def delta_forward(
    p: Params,
    cfg: TextConfig,
    x: jax.Array,  # [B, T, D]
    conv_q: Optional[jax.Array],  # STACKED [L, B, W, HK] or None
    conv_k: Optional[jax.Array],
    conv_v: Optional[jax.Array],
    h: Optional[jax.Array],  # STACKED [L, B, H, K, V] fp32 or None
    segment_ids: Optional[jax.Array] = None,
    mode: Optional[str] = None,
    layer_idx: int = 0,  # static index into the linear-layer stacks
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, ...]]]:
    """Reference GatedDeltaNet.forward (modeling_infinitevl.py:1219-1342).

    Cached calls take the STACKED conv/recurrent state arrays plus a static
    layer index and return the updated stacks (same discipline as the SWA
    path: per-layer slice round trips cost copies under XLA)."""
    B, T, _ = x.shape
    H = cfg.num_linear_heads
    K = cfg.linear_head_dim
    V = cfg.head_v_dim

    if (
        conv_q is None
        and mode is None
        and "q_proj" in p
        and cfg.delta_seq_chunk_t
        and T > cfg.delta_seq_chunk_t
    ):
        # long stateless (training) forward: evaluate the WHOLE layer in
        # sequence chunks so full-T intermediates never exist (see
        # delta_forward_seq_chunked). delta_seq_chunk_t gates ACTIVATION
        # (8K stays on the fastest full-T path); delta_seq_chunk_eval sets
        # the evaluation chunk — 4096 measured 13.5 GB total at 3B/32K vs
        # 14.9 GB with 8192 chunks (compiler HBM accounting, ROUND3_NOTES)
        return (
            delta_forward_seq_chunked(
                p, cfg, x, segment_ids,
                min(cfg.delta_seq_chunk_t, cfg.delta_seq_chunk_eval),
            ),
            None,
        )

    if "fused_proj" in p:  # fused layout (models/fuse.py): one matmul
        fused = _dense(x, p["fused_proj"])  # [B, T, 2HK+VD+2H+HV]
        hk, vd = H * K, H * V
        q_raw = fused[..., :hk]
        k_raw = fused[..., hk : 2 * hk]
        v_raw = fused[..., 2 * hk : 2 * hk + vd]
        a_lin = fused[..., 2 * hk + vd : 2 * hk + vd + H]
        b_lin = fused[..., 2 * hk + vd + H : 2 * hk + vd + 2 * H]
        g_lin = fused[..., 2 * hk + vd + 2 * H :]
    else:
        q_raw = _dense(x, p["q_proj"])  # [B, T, H*K]
        k_raw = _dense(x, p["k_proj"])
        v_raw = _dense(x, p["v_proj"])
        a_lin = _dense(x, p["a_proj"])
        b_lin = _dense(x, p["b_proj"])
        g_lin = _dense(x, p["g_proj"])

    use_cache = conv_q is not None
    decode = use_cache and T == 1
    if use_cache:
        cq_i = conv_q[layer_idx]
        ck_i = conv_k[layer_idx]
        cv_i = conv_v[layer_idx]
    else:
        cq_i = ck_i = cv_i = None

    if decode:
        q1, new_cq = short_conv_step(q_raw[:, 0], p["conv_q_w"], p.get("conv_q_b"), cq_i)
        k1, new_ck = short_conv_step(k_raw[:, 0], p["conv_k_w"], p.get("conv_k_b"), ck_i)
        v1, new_cv = short_conv_step(v_raw[:, 0], p["conv_v_w"], p.get("conv_v_b"), cv_i)
        q, k, v = q1[:, None], k1[:, None], v1[:, None]
    else:
        q, new_cq = short_conv(
            q_raw, p["conv_q_w"], p.get("conv_q_b"), cq_i,
            carry_history=cfg.conv_carry, segment_ids=segment_ids,
        )
        k, new_ck = short_conv(
            k_raw, p["conv_k_w"], p.get("conv_k_b"), ck_i,
            carry_history=cfg.conv_carry, segment_ids=segment_ids,
        )
        v, new_cv = short_conv(
            v_raw, p["conv_v_w"], p.get("conv_v_b"), cv_i,
            carry_history=cfg.conv_carry, segment_ids=segment_ids,
        )

    q = q.reshape(B, T, H, K)
    k = k.reshape(B, T, H, K)
    v = v.reshape(B, T, H, V)

    beta = jax.nn.sigmoid(b_lin.astype(jnp.float32))  # [B,T,H]
    # g/beta in fp32 (modeling_infinitevl.py:1294)
    g = -jnp.exp(p["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a_lin.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32)
    )

    new_h_stack = h
    if decode:
        if (
            cfg.use_pallas_delta_step
            and jax.default_backend() == "tpu"
            and K % 8 == 0
            and V % 128 == 0
        ):
            # fused kernel: one grid cell per batch row does both state
            # reductions, the decay+rank-1 update, and the in-place write
            # into the stacked state (input/output aliased)
            from ..ops.delta_pallas import delta_step_fused_stacked

            o1, new_h_stack = delta_step_fused_stacked(
                q[:, 0], k[:, 0], v[:, 0], g[:, 0], beta[:, 0], h, layer_idx
            )
        else:
            o1, new_h = delta_rule_step(
                q[:, 0], k[:, 0], v[:, 0], g[:, 0], beta[:, 0], h[layer_idx]
            )
            new_h_stack = jax.lax.dynamic_update_slice(
                h, new_h[None],
                (jnp.asarray(layer_idx),) + (jnp.zeros((), jnp.int32),) * 4,
            )
        o = o1[:, None]
    else:
        # the chunkwise math is chunk-size invariant; at short T the pad to
        # the next chunk multiple dominates, so shrink the chunk (measured
        # on v5e at T=257: chunk 64 -> 29.9 ms/frame vs 128 -> 30.3)
        chunk = cfg.delta_chunk_size
        if T <= 512:
            chunk = min(chunk, 64)
        n_chunks = -(-T // chunk)
        stream = (
            cfg.delta_stream_min_chunks > 0
            and n_chunks >= cfg.delta_stream_min_chunks
        )
        o, new_h = gated_delta_rule(
            q, k, v, g, beta,
            initial_state=h[layer_idx] if use_cache else None,
            chunk_size=chunk,
            recurrent_threshold=cfg.recurrent_threshold,
            segment_ids=segment_ids,
            mode=mode,
            stream=stream,
        )
        if use_cache:
            new_h_stack = jax.lax.dynamic_update_slice(
                h, new_h.astype(h.dtype)[None],
                (jnp.asarray(layer_idx),) + (jnp.zeros((), jnp.int32),) * 4,
            )

    gate = g_lin.reshape(B, T, H, V)
    o = rms_norm_gated(o, gate, p["o_norm"], eps=cfg.norm_eps)
    o = _dense(o.reshape(B, T, H * V), p["o_proj"])
    if use_cache:
        zero4 = (jnp.asarray(layer_idx),) + (jnp.zeros((), jnp.int32),) * 3
        new_state = (
            jax.lax.dynamic_update_slice(conv_q, new_cq[None], zero4),
            jax.lax.dynamic_update_slice(conv_k, new_ck[None], zero4),
            jax.lax.dynamic_update_slice(conv_v, new_cv[None], zero4),
            new_h_stack,
        )
    else:
        new_state = None
    return o, new_state


def swa_forward_seq_chunked(
    p: Params,
    cfg: TextConfig,
    x: jax.Array,  # [B, T, D]
    cos: jax.Array,  # [B, T, head_dim]
    sin: jax.Array,
    segment_ids: Optional[jax.Array],
    window: int,
    carry: Optional[Tuple] = None,
    return_carry: bool = False,
) -> Any:
    """Stateless (training) sliding-window attention layer evaluated in
    window-sized sequence chunks inside a checkpointed scan.

    A query at position p attends keys in (p - W, p], so chunking at C = W
    with the previous chunk's post-RoPE K/V carried gives every query its
    full window: attention runs over (prev ++ cur) = 2W tokens and keeps
    the current chunk's outputs. The first chunk's zero-KV carry rides
    segment id -1, which no real token matches. Exact vs the full-length
    path (tested); attention FLOPs roughly double for these layers, but
    the backward never holds full-T projections or the Hq-repeated KV
    ([16, 32K, 128] tensors were the top allocations at 32K after the
    delta layers were streamed). GQA K/V carried at Hkv=2 is 16 MB.

    carry / return_carry thread the (k, v, seg) chunk-boundary state
    across CALLS — the sequence-axis pipeline (parallel/pipeline_seq.py)
    feeds T/M-token chunks through stages with the carry as explicit
    pipeline state. Requires T % window == 0 (no pad) when used; the
    default call (carry=None, return_carry=False) is unchanged."""
    B, T, _ = x.shape
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    C = window
    seg = (
        segment_ids
        if segment_ids is not None
        else jnp.zeros((B, T), jnp.int32)
    ).astype(jnp.int32)
    pad = (-T) % C
    if pad:
        if carry is not None or return_carry:
            raise ValueError(
                f"carry threading requires T % window == 0 (T={T}, W={C})"
            )
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        cos = jnp.pad(cos, ((0, 0), (0, pad), (0, 0)))
        sin = jnp.pad(sin, ((0, 0), (0, pad), (0, 0)))
        seg = jnp.pad(seg, ((0, 0), (0, pad)), constant_values=-2)
    Tp = T + pad
    N = Tp // C
    D = x.shape[-1]
    xs = (
        jnp.moveaxis(x.reshape(B, N, C, D), 1, 0),
        jnp.moveaxis(cos.reshape(B, N, C, -1), 1, 0),
        jnp.moveaxis(sin.reshape(B, N, C, -1), 1, 0),
        jnp.moveaxis(seg.reshape(B, N, C), 1, 0),
    )
    pk0 = jnp.zeros((B, C, Hkv, Dh), x.dtype)
    pv0 = jnp.zeros((B, C, Hkv, Dh), x.dtype)
    pseg0 = jnp.full((B, C), -1, jnp.int32)

    def body(carry, inp):
        pk, pv, pseg = carry
        x_c, cos_c, sin_c, seg_c = inp
        q = _dense(x_c, p["q_proj"]).reshape(B, C, Hq, Dh)
        k = _dense(x_c, p["k_proj"]).reshape(B, C, Hkv, Dh)
        v = _dense(x_c, p["v_proj"]).reshape(B, C, Hkv, Dh)
        q, k = apply_rotary(q, k, cos_c, sin_c)
        # pad the query block with inert rows so (prev ++ cur) stays square
        # for swa_prefill_dense's equal-length contract; their outputs are
        # discarded
        qp = jnp.concatenate([jnp.zeros_like(q), q], axis=1)
        k2 = jnp.concatenate([pk, k], axis=1)
        v2 = jnp.concatenate([pv, v], axis=1)
        seg2 = jnp.concatenate([pseg, seg_c], axis=1)
        out = swa_prefill_dense(qp, k2, v2, window, segment_ids=seg2)
        y_c = _dense(out[:, C:].reshape(B, C, Hq * Dh), p["o_proj"])
        return (k, v, seg_c), y_c

    init = carry if carry is not None else (pk0, pv0, pseg0)
    carry_out, ys = jax.lax.scan(jax.checkpoint(body), init, xs)
    y = jnp.moveaxis(ys, 0, 1).reshape(B, Tp, D)[:, :T]
    return (y, carry_out) if return_carry else y


def delta_forward_seq_chunked(
    p: Params,
    cfg: TextConfig,
    x: jax.Array,  # [B, T, D]
    segment_ids: Optional[jax.Array],
    seq_chunk: int,
    carry: Optional[Tuple] = None,
    return_carry: bool = False,
) -> Any:
    """Stateless (training) DeltaNet layer evaluated in SEQUENCE chunks
    inside a checkpointed scan: projections, short conv, chunkwise delta,
    gated norm and o_proj all run per seq_chunk tokens, so the layer's
    backward never materializes full-length [T, H*V] intermediates — the
    32K-LoRA OOM root cause after the delta-kernel precompute itself was
    streamed (the XLA scheduler holds several layers' full-T conv/gate/o
    temporaries at once; measured 21.4 GB at 32K without this).

    Exactness (tested vs delta_forward in tests/test_text_model.py):
    - conv: the previous chunk's last W-1 raw projections ride the carry
      with their segment ids, so cross-chunk taps match the full-sequence
      zero-padded + segment-masked conv exactly.
    - delta state: carried fp32 [B, H, K, V]; when a chunk's first token
      starts a new packed segment the incoming state is zeroed, which is
      equivalent to the full call's g-zeroing at segment starts (the
      decay on a zero state is a no-op and within-chunk decay ratios
      cancel the un-zeroed g).
    Scan-carry residuals per layer backward: T/seq_chunk states (~17 MB at
    32K/4096) instead of multi-GB.

    carry / return_carry thread the (delta state, conv tails, tail segs)
    across CALLS for the sequence-axis pipeline
    (parallel/pipeline_seq.py); requires T % seq_chunk == 0 when used."""
    from ..ops.short_conv import causal_conv1d

    B, T, D = x.shape
    H = cfg.num_linear_heads
    K = cfg.linear_head_dim
    V = cfg.head_v_dim
    W = p["conv_q_w"].shape[0]
    C = seq_chunk
    seg = (
        segment_ids
        if segment_ids is not None
        else jnp.zeros((B, T), jnp.int32)
    ).astype(jnp.int32)
    pad = (-T) % C
    if pad:
        if carry is not None or return_carry:
            raise ValueError(
                f"carry threading requires T % seq_chunk == 0 "
                f"(T={T}, chunk={C})"
            )
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        # pad tokens get segment -2: they never interact with real tokens
        seg = jnp.pad(seg, ((0, 0), (0, pad)), constant_values=-2)
    Tp = T + pad
    N = Tp // C
    xs = (
        jnp.moveaxis(x.reshape(B, N, C, D), 1, 0),  # [N, B, C, D]
        jnp.moveaxis(seg.reshape(B, N, C), 1, 0),  # [N, B, C]
    )
    s0 = jnp.zeros((B, H, K, V), jnp.float32)
    tails0 = tuple(
        jnp.zeros((B, W - 1, p[f"conv_{n}_w"].shape[1]), x.dtype)
        for n in ("q", "k", "v")
    )
    # zero history starts invisible: segment -1 matches nothing real
    tseg0 = jnp.full((B, W - 1), -1, jnp.int32)

    def body(carry, inp):
        s, tq, tk, tv, tseg = carry
        x_c, seg_c = inp
        raws = []
        outs = []
        for name, tail in (("q", tq), ("k", tk), ("v", tv)):
            raw = _dense(x_c, p[f"{name}_proj"])
            hist = jnp.concatenate([jnp.zeros_like(tail[:, :1]), tail], axis=1)
            y = causal_conv1d(
                raw, p[f"conv_{name}_w"], p.get(f"conv_{name}_b"),
                initial_state=hist, segment_ids=seg_c,
                initial_state_segment_ids=tseg,
            )
            raws.append(raw)
            outs.append(y)
        q = outs[0].reshape(B, C, H, K)
        k = outs[1].reshape(B, C, H, K)
        v = outs[2].reshape(B, C, H, V)
        a_lin = _dense(x_c, p["a_proj"])
        b_lin = _dense(x_c, p["b_proj"])
        beta = jax.nn.sigmoid(b_lin.astype(jnp.float32))
        g = -jnp.exp(p["A_log"].astype(jnp.float32)) * jax.nn.softplus(
            a_lin.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32)
        )
        # a new segment at the chunk edge severs the carried state
        cont = (seg_c[:, 0] == tseg[:, -1])[:, None, None, None]
        from ..ops.delta_rule import delta_rule_chunk

        chunk = cfg.delta_chunk_size
        o, s_new = delta_rule_chunk(
            q, k, v, g, beta,
            initial_state=s * cont,
            chunk_size=chunk,
            segment_ids=seg_c,
            stream=False,
        )
        gate = _dense(x_c, p["g_proj"]).reshape(B, C, H, V)
        o = rms_norm_gated(o, gate, p["o_norm"], eps=cfg.norm_eps)
        y_c = _dense(o.reshape(B, C, H * V), p["o_proj"])
        new_carry = (
            s_new,
            raws[0][:, C - (W - 1):],
            raws[1][:, C - (W - 1):],
            raws[2][:, C - (W - 1):],
            seg_c[:, C - (W - 1):],
        )
        return new_carry, y_c

    init = carry if carry is not None else (s0, *tails0, tseg0)
    carry_out, ys = jax.lax.scan(jax.checkpoint(body), init, xs)
    y = jnp.moveaxis(ys, 0, 1).reshape(B, Tp, D)[:, :T]
    return (y, carry_out) if return_carry else y


def mamba2_forward(
    p: Params,
    cfg: TextConfig,
    x: jax.Array,  # [B, T, D]
    segment_ids: Optional[jax.Array] = None,
    conv_state: Optional[jax.Array] = None,  # STACKED [M, B, W, 3HD] or None
    h_state: Optional[jax.Array] = None,  # STACKED [M, B, H, Dh, Dh] fp32
    layer_idx: int = 0,  # static index into the mamba2 stacks
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    """Mamba2 SSD mixer, the reference's second conversion target
    (fla/layers/mamba2_new.py:165-255): q/k/v projections (= C/B/x of the
    SSD), a fused short conv over the concatenated [v, k, q] stream, per-head
    dt from in_proj, D skip connection, gated RMSNorm output.

    Cached calls (decode / chunked prefill) take the STACKED conv/SSM state
    plus a static layer index — a capability the reference layer declares
    but never wires (mamba2_new.py:170,252-254 ignores past_key_value and
    returns None), added here so converted models can serve.

    Returns (out [B, T, D], (conv_state', h_state') or None)."""
    from ..ops.mamba2 import mamba2_chunk_scan, mamba2_step
    from ..ops.short_conv import short_conv, short_conv_step

    B, T, _ = x.shape
    H = cfg.num_attention_heads
    Dh = cfg.head_dim
    HD = H * Dh

    q = _dense(x, p["q_proj"])  # C  [B, T, H*Dh]
    k = _dense(x, p["k_proj"])  # B
    v = _dense(x, p["v_proj"])  # x
    # fused conv over [v, k, q] (mamba2_new.py:196-219 convolutional_forward)
    vkq = jnp.concatenate([v, k, q], axis=-1)
    use_cache = conv_state is not None
    decode = use_cache and T == 1
    cs_i = conv_state[layer_idx] if use_cache else None
    if decode:
        vkq1, new_cs = short_conv_step(
            vkq[:, 0], p["conv_w"], p.get("conv_b"), cs_i, activation="silu"
        )
        vkq = vkq1[:, None]
    else:
        vkq, new_cs = short_conv(
            vkq, p["conv_w"], p.get("conv_b"), cs_i, activation="silu",
            carry_history=cfg.conv_carry, segment_ids=segment_ids,
        )
    v, k, q = vkq[..., :HD], vkq[..., HD : 2 * HD], vkq[..., 2 * HD :]
    v = v.reshape(B, T, H, Dh)
    k = k.reshape(B, T, H, Dh)
    q = q.reshape(B, T, H, Dh)

    dt = jax.nn.softplus(
        _dense(x, p["dt_proj"]).astype(jnp.float32)
        + p["dt_bias"].astype(jnp.float32)
    )  # [B, T, H]
    A = -jnp.exp(p["A_log"].astype(jnp.float32))  # [H]
    if decode:
        y1, new_h = mamba2_step(
            v[:, 0], dt[:, 0], A, k[:, 0], q[:, 0], h_state[layer_idx]
        )
        y = y1[:, None]
    else:
        y, new_h = mamba2_chunk_scan(
            v, dt, A, k, q,
            initial_state=h_state[layer_idx] if use_cache else None,
            chunk_size=cfg.delta_chunk_size,
            segment_ids=segment_ids,
        )
    # D skip (mamba2_new.py:240-241)
    y = y + p["D"].astype(y.dtype)[None, None, :, None] * v
    gate = _dense(x, p["g_proj"]).reshape(B, T, H, Dh)
    o = rms_norm_gated(y, gate, p["o_norm"], eps=cfg.norm_eps)
    out = _dense(o.reshape(B, T, HD), p["o_proj"])
    if not use_cache:
        return out, None
    zero3 = (jnp.asarray(layer_idx),) + (jnp.zeros((), jnp.int32),) * 3
    zero4 = (jnp.asarray(layer_idx),) + (jnp.zeros((), jnp.int32),) * 4
    new_state = (
        jax.lax.dynamic_update_slice(
            conv_state, new_cs.astype(conv_state.dtype)[None], zero3
        ),
        jax.lax.dynamic_update_slice(h_state, new_h[None], zero4),
    )
    return out, new_state


# ---------------------------------------------------------------------------
# Decoder stack
# ---------------------------------------------------------------------------


def decoder_layer_forward(
    p: Params,
    cfg: TextConfig,
    role: str,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    layer_state: Optional[Tuple],
    segment_ids: Optional[jax.Array],
) -> Tuple[jax.Array, Optional[Tuple]]:
    """Pre-norm residual block (modeling_infinitevl.py:1350-1429)."""
    resid = x
    h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
    if role == SLIDING or role == FULL:
        if role == FULL and layer_state is not None:
            raise NotImplementedError(
                "cached decoding with full_attention layers is not supported; "
                "InfiniteVL's deployed config has none (teacher models run "
                "stateless during distillation)"
            )
        rings_k, rings_v, cum_len, swa_i = layer_state or (None, None, None, 0)
        window = cfg.sliding_window if role == SLIDING else (1 << 30)
        attn, new_rk, new_rv = swa_attention_forward(
            p, cfg, h, cos, sin, rings_k, rings_v, cum_len,
            layer_idx=swa_i, segment_ids=segment_ids, window=window,
        )
        new_state = (new_rk, new_rv) if layer_state else None
    elif role == LINEAR:
        cq, ck, cv, hst, lin_i = layer_state or (None, None, None, None, 0)
        attn, new_state = delta_forward(
            p, cfg, h, cq, ck, cv, hst, segment_ids, layer_idx=lin_i
        )
    elif role == MAMBA2:
        mcs, mhs, m2_i = layer_state or (None, None, 0)
        attn, new_state = mamba2_forward(
            p, cfg, h, segment_ids, conv_state=mcs, h_state=mhs,
            layer_idx=m2_i,
        )
    else:
        raise NotImplementedError(f"layer role {role}")
    x = resid + attn
    resid = x
    h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
    ct = cfg.mlp_chunk_t
    if ct and layer_state is None and h.shape[1] > ct and h.shape[1] % ct == 0:
        x = resid + mlp_forward_chunked(p["mlp"], h, ct)
    else:
        x = resid + mlp_forward(p["mlp"], h)
    return x, new_state


def init_layer_seq_carry(p: Params, cfg: TextConfig, role: str, B: int,
                         dtype) -> Tuple:
    """Zero chunk-boundary carry for decoder_layer_chunk_forward.

    SLIDING: previous window-sized chunk's post-RoPE (k, v) with segment
    ids -1 (zero history invisible to every real token). LINEAR: fp32
    delta state + the conv tails (last W-1 raw projections) with tail
    segment ids -1. Shapes mirror the in-scan carries of
    swa_forward_seq_chunked / delta_forward_seq_chunked."""
    if role == SLIDING:
        W = cfg.sliding_window
        Hkv, Dh = cfg.num_key_value_heads, cfg.head_dim
        return (
            jnp.zeros((B, W, Hkv, Dh), dtype),
            jnp.zeros((B, W, Hkv, Dh), dtype),
            jnp.full((B, W), -1, jnp.int32),
        )
    if role == LINEAR:
        H, K, V = cfg.num_linear_heads, cfg.linear_head_dim, cfg.head_v_dim
        W = p["conv_q_w"].shape[0]
        tails = tuple(
            jnp.zeros((B, W - 1, p[f"conv_{n}_w"].shape[1]), dtype)
            for n in ("q", "k", "v")
        )
        return (
            jnp.zeros((B, H, K, V), jnp.float32),
            *tails,
            jnp.full((B, W - 1), -1, jnp.int32),
        )
    raise NotImplementedError(
        f"sequence-axis pipeline supports sliding/linear layers only "
        f"(got {role!r}); full_attention needs cross-chunk global KV and "
        f"the deployed InfiniteVL config has none"
    )


def decoder_layer_chunk_forward(
    p: Params,
    cfg: TextConfig,
    role: str,
    x: jax.Array,  # [B, Tc, D] one sequence chunk
    cos: jax.Array,
    sin: jax.Array,
    segment_ids: Optional[jax.Array],
    carry: Tuple,
) -> Tuple[jax.Array, Tuple]:
    """Carry-form pre-norm residual block: one TRAINING forward over a
    sequence CHUNK with the cross-chunk state explicit — the unit the
    sequence-axis pipeline schedules (parallel/pipeline_seq.py). Exactly
    the decoder_layer_forward math: feeding chunks left-to-right and
    threading the carry reproduces the full-T stateless forward (tested
    in tests/test_pipeline_seq.py). Requires Tc % sliding_window == 0
    for SWA layers (the chunked-attention carry contract)."""
    resid = x
    h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
    if role == SLIDING:
        attn, new_carry = swa_forward_seq_chunked(
            p, cfg, h, cos, sin, segment_ids, cfg.sliding_window,
            carry=carry, return_carry=True,
        )
    elif role == LINEAR:
        Tc = x.shape[1]
        sc = min(
            cfg.delta_seq_chunk_t or Tc, cfg.delta_seq_chunk_eval, Tc
        )
        if Tc % sc:
            sc = Tc
        attn, new_carry = delta_forward_seq_chunked(
            p, cfg, h, segment_ids, sc, carry=carry, return_carry=True
        )
    else:
        raise NotImplementedError(
            f"sequence-axis pipeline supports sliding/linear layers only "
            f"(got {role!r})"
        )
    x = resid + attn
    resid = x
    h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
    ct = cfg.mlp_chunk_t
    if ct and h.shape[1] > ct and h.shape[1] % ct == 0:
        x = resid + mlp_forward_chunked(p["mlp"], h, ct)
    else:
        x = resid + mlp_forward(p["mlp"], h)
    return x, new_carry


def text_forward(
    params: Params,
    cfg: TextConfig,
    inputs_embeds: jax.Array,  # [B, T, D]
    position_ids: jax.Array,  # [3, B, T]
    state: Optional[DecoderState] = None,
    segment_ids: Optional[jax.Array] = None,
    output_hidden_states: bool = False,
    remat: bool = False,
    remat_group: int = 1,
    remat_barrier: bool = False,
    scan_unroll: int = 1,
    remat_mode: str = "auto",
):
    """Run the decoder stack.

    remat_mode (layer_stacks path only) picks where jax.checkpoint wraps
    inside the scan-over-layers; the seq-chunked layer internals keep
    their own chunk-level checkpoint in every mode. Measured on v5e
    (scripts/probe_remat_mode.py, 3B LoRA step, B=1; tok/s):

        mode    ckpts           16K   32K   64K(int8 base)
        nested  body+layer+chunk 2959  2951  ~2998 (bench r5)
        layer   layer+chunk      3434  3432  OOM
        scan    body+chunk       3223  3202  (see auto rule)
        none    chunk only       blocked: remote-compiler HTTP 500

    - "auto" (default): resolved at trace time from B*T — "layer" when
      B*T <= 32768, else "scan". layer wins +16% over the r4 nested
      recipe (35.9% vs 31.0% MFU) but its saved layer boundaries grow
      num_layers*B*T*D bytes (9.7 GB at 64K) and OOM one v5e past 32K.
    - "scan": checkpoint the scan BODY only (one boundary per period
      step). The backward replays the body once, then differentiates
      straight through to the chunk-level checkpoints, holding one
      PERIOD's chunk checkpoints at a time.
    - "nested": checkpoint the body AND each layer inside it (round-4
      recipe). The layer replay is a THIRD recompute of every body flop
      — probe_mfu_attrib measured its B-4A residual at ~1x the whole
      forward (19% of the step at both 16K and 32K) — but the backward
      holds only one LAYER's internals at a time. Fallback for shapes
      where "scan" does not fit.
    - "layer": checkpoint each layer only; the scan saves every layer
      boundary. Same recompute count as "scan" (each layer replayed
      once) but the backward holds one LAYER's chunk checkpoints at a
      time — the fastest mode wherever its boundary memory fits.
    - "none": no body/layer checkpoint at all — only the chunk-level
      checkpoints inside the seq-chunked delta/swa/mlp paths bound the
      backward. Cheapest recompute (the chunk replay is the only one)
      but the scan saves every sub-part input at full T; fits shorter
      contexts only. (Unmeasurable today: the relay's remote compiler
      crashes HTTP 500 on it at 16K/32K/64K.)

    scan_unroll (layer_stacks path only) partially unrolls the HLO layer
    loop: k bodies inline per iteration at ~k bodies' residual memory.
    Probed NEUTRAL on v5e at 16K (2933 vs 2959 tok/s) and unaffordable at
    32K (15.6 GB) — scripts/probe_scan_unroll.py; kept as a dial for
    other chips/shapes.

    remat_group > 1 checkpoints GROUPS of layers instead of each layer:
    only num_layers/remat_group boundary activations stay live (134 MB
    each at 3B/32K — per-layer remat alone keeps 4.8 GB of boundaries,
    which together with the merged-LoRA copies overflows one v5e at the
    stage-3 32K recipe), at the cost of recomputing the group's inner
    layers once more in the backward. Ignored when output_hidden_states
    (distillation needs every layer boundary anyway).

    remat_barrier=True sequences the backward recomputes with
    lax.optimization_barrier (utils/remat.barrier_remat): the python
    layer loop keeps its fully-unrolled forward but the scheduler can no
    longer hoist every layer's recompute at once — the remat-memory
    behavior of scan-over-layers without the HLO loop's throughput cost.
    No-op on the layer_stacks path (a scan serializes by construction).

    Returns (hidden [B,T,D], new_state or None, hidden_states list or None).
    """
    cos, sin = mrope_cos_sin(
        position_ids,
        params["inv_freq"],
        cfg.mrope_section,
        cfg.attention_scaling,
        dtype=inputs_embeds.dtype,
    )
    x = inputs_embeds
    new_state = dict(state) if state is not None else None
    collected = [] if output_hidden_states else None

    if "layer_stacks" in params:
        # scan-over-layers (models/stacked.py): one HLO loop over the layer
        # pattern period — the backward holds one body's residuals at a
        # time BY CONSTRUCTION (a Python layer loop lets the scheduler
        # hoist every layer's remat recompute; measured 17.9 GB plateau at
        # 3B/32K). Training-only: stateless, no hidden-state collection.
        if state is not None or collected is not None:
            raise ValueError(
                "layer_stacks params support stateless training forwards "
                "only (unstack_layer_params for inference/distillation)"
            )
        stacks = params["layer_stacks"]
        period = len(stacks)
        pattern = tuple(cfg.layer_role(j) for j in range(period))

        if remat_mode == "auto":
            # trace-time resolution (shapes are static under jit): "layer"
            # is the measured-fastest mode but saves num_layers * B*T * D
            # boundary bytes — 4.8 GB at B*T=32K, 9.7 GB at 64K (OOM on
            # one v5e with the 3B model); "scan" saves period boundaries
            # only. Probe table in the docstring.
            remat_mode = "layer" if x.shape[0] * x.shape[1] <= 32768 else "scan"
        if remat_mode not in ("scan", "nested", "layer", "none"):
            raise ValueError(
                f"unknown remat_mode {remat_mode!r} "
                "(scan/nested/layer/none/auto)"
            )
        ckpt_layer = remat and remat_mode in ("nested", "layer")
        ckpt_body = remat and remat_mode in ("nested", "scan")

        def body(x, slices):
            for j, role in enumerate(pattern):
                layer_fn = functools.partial(
                    decoder_layer_forward, cfg=cfg, role=role
                )
                if ckpt_layer:
                    layer_fn = jax.checkpoint(
                        lambda lp, x, _f=layer_fn: _f(
                            lp, x=x, cos=cos, sin=sin, layer_state=None,
                            segment_ids=segment_ids,
                        )
                    )
                    x, _ = layer_fn(slices[j], x)
                else:
                    x, _ = layer_fn(
                        slices[j], x=x, cos=cos, sin=sin, layer_state=None,
                        segment_ids=segment_ids,
                    )
            return x, None

        scan_body = jax.checkpoint(body) if ckpt_body else body
        x, _ = jax.lax.scan(
            scan_body, x, tuple(stacks), unroll=max(1, scan_unroll)
        )
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, None, None

    swa_i = 0
    lin_i = 0
    m2_i = 0
    if (
        remat
        and state is None
        and collected is None
        and remat_group > 1
    ):
        roles_all = tuple(
            cfg.layer_role(i) for i in range(len(params["layers"]))
        )

        def run_group(roles, group_params, x, cos, sin, segment_ids):
            # NESTED checkpointing: each layer inside the group is itself
            # rematted, so the group's backward recompute never holds more
            # than one layer's internals (a flat group blows up to 6 layers
            # of [T, 12K] projections live at once — measured 45 GB at 32K)
            for lp, role in zip(group_params, roles):
                layer_fn = jax.checkpoint(
                    functools.partial(decoder_layer_forward, lp, cfg, role)
                )
                x, _ = layer_fn(x, cos, sin, None, segment_ids)
            return x

        from ..utils.remat import barrier_remat

        wrap = barrier_remat if remat_barrier else jax.checkpoint
        for start in range(0, len(params["layers"]), remat_group):
            end = start + remat_group
            group_fn = wrap(
                functools.partial(run_group, roles_all[start:end])
            )
            x = group_fn(
                params["layers"][start:end], x, cos, sin, segment_ids
            )
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, None, None

    for idx, layer_p in enumerate(params["layers"]):
        role = cfg.layer_role(idx)
        if collected is not None:
            collected.append(x)
        if state is not None and role == SLIDING:
            # pass the STACKED ring arrays (threaded through new_state) plus
            # the static layer index: per-layer slice/stack-write round
            # trips cost full ring copies under XLA (see swa_attention_forward)
            layer_state = (
                new_state["swa_k"],
                new_state["swa_v"],
                state["cum_len"],
                swa_i,
            )
        elif state is not None and role == LINEAR:
            # stacked conv/recurrent state + static index (see delta_forward)
            layer_state = (
                new_state["conv_q"],
                new_state["conv_k"],
                new_state["conv_v"],
                new_state["delta_h"],
                lin_i,
            )
        elif state is not None and role == MAMBA2:
            layer_state = (
                new_state["mamba_conv"],
                new_state["mamba_h"],
                m2_i,
            )
        else:
            if state is not None and role == FULL:
                raise NotImplementedError(
                    "cached decoding with full_attention layers is not "
                    "supported (the deployed InfiniteVL config has none)"
                )
            layer_state = None
        layer_fn = decoder_layer_forward
        if remat and state is None and remat_barrier:
            # params go through as ARGS (custom_vjp cannot differentiate
            # closed-over tracers); layer_state is None on training paths
            from ..utils.remat import barrier_remat

            def _layer(lp, h, c, s, seg, _role=role):
                out, _ = decoder_layer_forward(lp, cfg, _role, h, c, s, None, seg)
                return out

            x = barrier_remat(_layer)(layer_p, x, cos, sin, segment_ids)
            out_state = None
        elif remat and state is None:
            # gradient checkpointing: recompute each layer's internals in the
            # backward pass (reference model_utils/checkpointing.py role)
            layer_fn = jax.checkpoint(
                functools.partial(decoder_layer_forward, layer_p, cfg, role),
                static_argnums=(),
            )
            x, out_state = layer_fn(x, cos, sin, layer_state, segment_ids)
        else:
            x, out_state = layer_fn(
                layer_p, cfg, role, x, cos, sin, layer_state, segment_ids
            )
        if state is not None:
            if role == SLIDING:
                # out_state already holds the updated STACKS
                new_state["swa_k"] = out_state[0]
                new_state["swa_v"] = out_state[1]
                swa_i += 1
            elif role == LINEAR:
                # out_state already holds the updated STACKS
                new_state["conv_q"] = out_state[0]
                new_state["conv_k"] = out_state[1]
                new_state["conv_v"] = out_state[2]
                new_state["delta_h"] = out_state[3]
                lin_i += 1
            elif role == MAMBA2:
                new_state["mamba_conv"] = out_state[0]
                new_state["mamba_h"] = out_state[1]
                m2_i += 1

    if collected is not None:
        # collected[i] = layer i's input; collected[n] = last layer's output
        # (pre final norm, what distillation hooks see); collected[n+1] =
        # the normed final hidden.
        collected.append(x)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if collected is not None:
        collected.append(x)
    if state is not None:
        new_state["cum_len"] = state["cum_len"] + inputs_embeds.shape[1]
    return x, new_state, collected


def lm_head(params: Params, cfg: TextConfig, hidden: jax.Array) -> jax.Array:
    """Logits. Tied to the embedding when cfg.tie_word_embeddings.

    Quantized serving (models/quant.quantize_embed_rows): the head reads
    the PRE-TRANSPOSED int8 copy `head_q` [hidden, vocab] — a plain
    contraction whose int8->bf16 convert fuses into the operand read, so
    the per-token head read is 311 MB instead of the bf16 table's 622.
    (Contracting the gather-layout [vocab, hidden] int8 table instead
    measured 10.89 ms/tok vs plain int8's 6.81 — the convert+transpose
    does not fuse; scripts/probe_decode_matrix.py.) The row scales are
    per-logit column scales and commute exactly."""
    if "lm_head_q" in params:  # untied quantized head [hidden, vocab]
        q, s = params["lm_head_q"], params["lm_head_scale"]
    elif "lm_head" in params:
        w = params["lm_head"]
        return (hidden @ w.astype(hidden.dtype)).astype(jnp.float32)
    elif "head_q" in params:  # tied quantized table, head copy
        q, s = params["head_q"], params["embed_scale"]
    else:
        # bf16 tied table: XLA streams the transposed dot operand
        # natively (measured 10.45 vs 10.59 ms/tok for an explicit
        # dot_general formulation — identical within noise)
        w = params["embed"].T
        return (hidden @ w.astype(hidden.dtype)).astype(jnp.float32)
    logits = (hidden @ q.astype(hidden.dtype)) * s.astype(hidden.dtype)
    return logits.astype(jnp.float32)


def embed_tokens(params: Params, input_ids: jax.Array) -> jax.Array:
    if "embed_q" in params:
        # int8 gather + per-row dequant; output dtype rides on the scale
        # leaf (stored in the original table dtype — quantize_embed_rows)
        s = params["embed_scale"][input_ids]
        return params["embed_q"][input_ids].astype(s.dtype) * s[..., None]
    return params["embed"][input_ids]
