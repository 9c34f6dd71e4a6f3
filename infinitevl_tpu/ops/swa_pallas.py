"""Pallas flash attention over the sliding-window ring KV buffer.

Replaces the XLA dense path of ops/swa.py's cached attention (which
materializes [T, cap+T] logits in HBM — ~140 MB/layer at the deployed
config) with an online-softmax kernel. TPU counterpart of the reference's
FlashAttention-2 sliding-window path (modeling_infinitevl.py:1028,1067-1108).

Structure: grid (B, Hkv, NQ, NK) with the KV-block axis innermost; TPU grids
iterate sequentially, so the fp32 accumulator / running-max / running-sum
scratch persists across KV blocks for each query block and the output block
is written on the last one — the canonical TPU flash pattern (no in-kernel
loops, fast Mosaic compiles, BlockSpec-pipelined KV streaming from HBM).
Query blocking (NQ) bounds VMEM for long-chunk prefill (T in the thousands);
at streaming sizes (T=257) a single query block keeps the round-1 shape.

Key positions: the caller concatenates (ring ++ current) into one key array;
blocks with flat index s < cap are ring slots holding token
kp = cum_len-1 - ((cum_len-1 - s) mod cap) (valid iff kp >= 0); blocks with
s >= cap are current-step keys at kp = cum_len + (s - cap). Query row
r = t*G + g has position qp = cum_len + t. Visibility: kp <= qp and
kp > qp - window.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _swa_kernel(
    # scalar prefetch
    cum_len_ref,  # [1] int32
    # inputs
    q_ref,  # [1, 1, Rb, D]  rows r = t*G + g (query block)
    k_ref,  # [1, 1, block_k, D]
    v_ref,  # [1, 1, block_k, D]
    # outputs
    o_ref,  # [1, 1, Rb, D]
    # scratch (persists across the sequential KV-block grid axis)
    acc_ref,  # [Rb, D] f32
    m_ref,  # [Rb, 128] f32
    l_ref,  # [Rb, 128] f32
    *,
    window: int,
    block_k: int,
    cap: int,
    t_real: int,
    groups: int,
    scale: float,
):
    i = pl.program_id(2)  # query block
    j = pl.program_id(3)  # kv block (innermost: scratch carries over j)
    nk = pl.num_programs(3)
    R, D = q_ref.shape[2], q_ref.shape[3]
    cum_len = cum_len_ref[0]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # native-dtype operands, fp32 accumulation: bf16 x bf16 -> fp32 runs
    # at full MXU rate (fp32 x fp32 is emulated ~8x slower) and, since the
    # inputs ARE bf16, the products are bit-identical either way — the
    # scale moves onto the fp32 scores (same change as ops/vit_flash.py)
    s = (
        jnp.dot(q_ref[0, 0], k_ref[0, 0].T, preferred_element_type=jnp.float32)
        * scale
    )

    # positions factor into a row vector (query) and a column vector (key):
    # the expensive div/mod run on R + block_k elements, not R*block_k
    row = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    qp = cum_len + row // groups  # [R, 1]
    flat = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    m0 = (cum_len - 1) % cap
    ring_kp = cum_len - 1 - jnp.mod(m0 - flat, cap)
    new_off = flat - cap
    new_kp = jnp.where(new_off < t_real, cum_len + new_off, -1)
    kp = jnp.where(flat < cap, jnp.where(ring_kp >= 0, ring_kp, -1), new_kp)
    mask = (kp >= 0) & (kp <= qp) & (kp > qp - window)  # broadcast [R, block_k]

    s = jnp.where(mask, s, NEG_INF)
    m_prev = m_ref[:, :1]
    m_cur = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)
    l_ref[:, :1] = l_ref[:, :1] * alpha + p.sum(axis=-1, keepdims=True)
    m_ref[:, :1] = m_cur
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _finish():
        o_ref[0, 0] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "scale", "block_k", "block_q", "interpret"),
)
def swa_ring_flash_attention(
    q: jax.Array,  # [B, T, Hq, D]
    new_k: jax.Array,  # [B, T, Hkv, D]
    new_v: jax.Array,
    ring_k: jax.Array,  # [B, Hkv, cap, D] head-major, cap % block_k == 0
    ring_v: jax.Array,
    cum_len: jax.Array,  # scalar int32
    window: int,
    scale: Optional[float] = None,
    block_k: Optional[int] = None,
    block_q: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over (ring ++ current) with the sliding-window mask.
    Returns [B, T, Hq, D]. Numerics match ops.swa.swa_cached_attention.

    Query rows are blocked at `block_q` (VMEM ~ block_q*(D+2)*4 bytes of
    scratch), so chunked long-context prefill (T in the thousands) compiles
    within the 128 MB VMEM budget; at streaming sizes a single block covers
    all rows. block_k defaults to the largest of 1024/512 whose fp32 score
    tile Rb x block_k stays inside the ~16 MB scoped-VMEM stack (1024
    measured 0.4 ms/frame faster than 512 at streaming shapes; 2048 OOMs)."""
    B, T, Hq, D = q.shape
    Hkv = new_k.shape[2]
    G = Hq // Hkv
    cap = ring_k.shape[2]
    if block_k is None:
        rb_planned = min(block_q, T * G)
        block_k = (
            1024
            if rb_planned * 1024 * 4 <= 9_000_000 and cap % 1024 == 0
            else 512
        )
    if cap % block_k:
        raise ValueError(f"ring capacity {cap} must be a multiple of {block_k}")
    if scale is None:
        scale = D**-0.5
    Tp = ((T + block_k - 1) // block_k) * block_k
    pad = Tp - T
    kn = jnp.pad(new_k, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vn = jnp.pad(new_v, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    # head-major [B, Hkv, cap+Tp, D]
    keys = jnp.concatenate([ring_k, kn], axis=2)
    vals = jnp.concatenate([ring_v, vn], axis=2)
    R = T * G
    Rb = min(block_q, R)
    Rp = -(-R // Rb) * Rb
    qg = q.reshape(B, T, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, R, D)
    if Rp != R:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
    NQ = Rp // Rb
    NK = (cap + Tp) // block_k
    out = pl.pallas_call(
        functools.partial(
            _swa_kernel,
            window=window,
            block_k=block_k,
            cap=cap,
            t_real=T,
            groups=G,
            scale=scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv, NQ, NK),
            in_specs=[
                pl.BlockSpec((1, 1, Rb, D), lambda b, h, i, j, c: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, block_k, D), lambda b, h, i, j, c: (b, h, j, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, D), lambda b, h, i, j, c: (b, h, j, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, Rb, D), lambda b, h, i, j, c: (b, h, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((Rb, D), jnp.float32),
                pltpu.VMEM((Rb, 128), jnp.float32),
                pltpu.VMEM((Rb, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Rp, D), q.dtype),
        interpret=interpret,
    )(cum_len.reshape(1), qg, keys, vals)
    out = out[:, :, :R]
    out = out.reshape(B, Hkv, T, G, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, Hq, D)


# ---------------------------------------------------------------------------
# Decode fast path: write-then-attend over the ring only (no concat/copies).
#
# Correct for T == 1: writing token n = cum_len evicts token n - cap. That
# evicted token is visible to a query at position qp only if
# (n - cap) > qp - window; with cap == window and the single query at
# qp == n this reads n - window > n - window — false. So the eviction can
# never remove a key the current query needs, and the freshly-written slot
# provides the query's self-attention key. (For T > 1 earlier queries in the
# step could still need evicted keys — the prefill path above handles that.)
# ---------------------------------------------------------------------------


def _swa_decode_kernel(
    cum_incl_ref,  # [1] int32: tokens INCLUDING the one just written
    q_ref,  # [1, 1, G, D]
    k_ref,  # [1, 1, block_k, D] ring block
    v_ref,
    o_ref,  # [1, 1, G, D]
    acc_ref,  # [G, D] f32
    m_ref,  # [G, 128] f32
    l_ref,  # [G, 128] f32
    *,
    window: int,
    block_k: int,
    cap: int,
    scale: float,
):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    G, D = q_ref.shape[2], q_ref.shape[3]
    cum_incl = cum_incl_ref[0]
    qp = cum_incl - 1  # the query's position

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # native-dtype QK^T, fp32 accumulation (see the prefill kernel note)
    s = jnp.dot(q_ref[0, 0], k_ref[0, 0].T,
                preferred_element_type=jnp.float32) * scale  # [G, block_k]

    slot = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (G, block_k), 1)
    m0 = (cum_incl - 1) % cap
    kp = cum_incl - 1 - jnp.mod(m0 - slot, cap)
    mask = (kp >= 0) & (kp <= qp) & (kp > qp - window)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)
    l_ref[:, :1] = l_ref[:, :1] * alpha + p.sum(axis=-1, keepdims=True)
    m_ref[:, :1] = m_cur
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _finish():
        o_ref[0, 0] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


def _swa_decode_kernel_stacked(
    cum_incl_ref,  # [1] int32
    q_ref,  # [1, 1, G, D]
    k_ref,  # [1, 1, 1, block_k, D] block of the stacked [S,B,Hkv,cap,D] ring
    v_ref,
    o_ref,  # [1, 1, G, D]
    acc_ref,
    m_ref,
    l_ref,
    *,
    window: int,
    block_k: int,
    cap: int,
    scale: float,
):
    """Same math as _swa_decode_kernel; the KV blocks come straight from the
    stacked per-layer ring (no per-layer slice materialization)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    G, D = q_ref.shape[2], q_ref.shape[3]
    cum_incl = cum_incl_ref[0]
    qp = cum_incl - 1

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # native-dtype QK^T, fp32 accumulation (see the prefill kernel note)
    s = jnp.dot(q_ref[0, 0], k_ref[0, 0, 0].T,
                preferred_element_type=jnp.float32) * scale

    slot = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    m0 = (cum_incl - 1) % cap
    kp = cum_incl - 1 - jnp.mod(m0 - slot, cap)  # [1, block_k]
    mask = (kp >= 0) & (kp <= qp) & (kp > qp - window)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)
    l_ref[:, :1] = l_ref[:, :1] * alpha + p.sum(axis=-1, keepdims=True)
    m_ref[:, :1] = m_cur
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0, 0, 0],
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _finish():
        o_ref[0, 0] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("layer", "window", "scale", "block_k", "interpret"),
)
def swa_ring_flash_decode_stacked(
    q: jax.Array,  # [B, 1, Hq, D]
    new_k: jax.Array,  # [B, 1, Hkv, D]
    new_v: jax.Array,
    rings_k: jax.Array,  # [S, B, Hkv, cap, D] STACKED per-layer rings
    rings_v: jax.Array,
    layer: int,  # static layer index into the stack
    cum_len: jax.Array,  # scalar int32 (tokens BEFORE this one)
    window: int,
    scale: Optional[float] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
):
    """Decode step operating on the STACKED state arrays directly.

    Avoids the per-layer slice -> update -> stack-write round trip that XLA
    materializes as full ring copies (measured 2.4 ms/step at B=8 for the
    9-layer stack vs 0.26 ms for direct writes): the token's KV lands via
    one dynamic_update_slice into the donated stack, and the kernel's
    BlockSpecs read (block_k, D) tiles straight out of the stacked array at
    the static layer offset. Returns (out [B,1,Hq,D], rings_k', rings_v')."""
    B, T, Hq, D = q.shape
    assert T == 1, "decode path requires T == 1"
    Hkv = new_k.shape[2]
    G = Hq // Hkv
    cap = rings_k.shape[3]
    if block_k is None:
        block_k = next(
            (b for b in (4096, 2048, 1024, 512) if cap % b == 0), 512
        )
    if cap % block_k:
        raise ValueError(f"ring capacity {cap} must be a multiple of {block_k}")
    if scale is None:
        scale = D**-0.5
    slot = jnp.mod(cum_len, cap)
    zero = jnp.zeros((), jnp.int32)
    kv_k = new_k.transpose(0, 2, 1, 3)[None].astype(rings_k.dtype)  # [1,B,Hkv,1,D]
    kv_v = new_v.transpose(0, 2, 1, 3)[None].astype(rings_v.dtype)
    lyr = jnp.asarray(layer, jnp.int32)
    rings_k = jax.lax.dynamic_update_slice(
        rings_k, kv_k, (lyr, zero, zero, slot, zero)
    )
    rings_v = jax.lax.dynamic_update_slice(
        rings_v, kv_v, (lyr, zero, zero, slot, zero)
    )
    qg = q.reshape(B, 1, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, G, D)
    NK = cap // block_k
    out = pl.pallas_call(
        functools.partial(
            _swa_decode_kernel_stacked,
            window=window,
            block_k=block_k,
            cap=cap,
            scale=scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv, NK),
            in_specs=[
                pl.BlockSpec((1, 1, G, D), lambda b, h, j, c: (b, h, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 1, block_k, D),
                    lambda b, h, j, c: (layer, b, h, j, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, block_k, D),
                    lambda b, h, j, c: (layer, b, h, j, 0),
                ),
            ],
            out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, j, c: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, D), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )((cum_len + 1).reshape(1), qg, rings_k, rings_v)
    out = out.reshape(B, Hkv, 1, G, D).transpose(0, 2, 1, 3, 4).reshape(B, 1, Hq, D)
    return out, rings_k, rings_v


@functools.partial(
    jax.jit, static_argnames=("window", "scale", "block_k", "interpret")
)
def swa_ring_flash_decode(
    q: jax.Array,  # [B, 1, Hq, D]
    new_k: jax.Array,  # [B, 1, Hkv, D]
    new_v: jax.Array,
    ring_k: jax.Array,  # [B, Hkv, cap, D]
    ring_v: jax.Array,
    cum_len: jax.Array,  # scalar int32 (tokens BEFORE this one)
    window: int,
    scale: Optional[float] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
):
    """Single-token decode: write the token's KV into the ring, then flash
    over the ring alone. Returns (out [B,1,Hq,D], ring_k', ring_v')."""
    from .swa import ring_write

    B, T, Hq, D = q.shape
    assert T == 1, "decode path requires T == 1"
    Hkv = new_k.shape[2]
    G = Hq // Hkv
    cap = ring_k.shape[2]
    if block_k is None:
        # G query rows make the per-block matmul tiny; large KV blocks
        # amortize the per-grid-step overhead (matters for huge windows)
        block_k = next(
            (b for b in (4096, 2048, 1024, 512) if cap % b == 0), 512
        )
    if cap % block_k:
        raise ValueError(f"ring capacity {cap} must be a multiple of {block_k}")
    if scale is None:
        scale = D**-0.5
    ring_k, ring_v = ring_write(ring_k, ring_v, new_k, new_v, cum_len)
    qg = q.reshape(B, 1, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, G, D)
    NK = cap // block_k
    out = pl.pallas_call(
        functools.partial(
            _swa_decode_kernel,
            window=window,
            block_k=block_k,
            cap=cap,
            scale=scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv, NK),
            in_specs=[
                pl.BlockSpec((1, 1, G, D), lambda b, h, j, c: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, c: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, c: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, j, c: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, D), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )((cum_len + 1).reshape(1), qg, ring_k, ring_v)
    out = out.reshape(B, Hkv, 1, G, D).transpose(0, 2, 1, 3, 4).reshape(B, 1, Hq, D)
    return out, ring_k, ring_v
