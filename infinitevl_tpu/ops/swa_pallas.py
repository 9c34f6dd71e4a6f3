"""Pallas flash attention over the sliding-window ring KV buffer.

Replaces the XLA dense path of ops/swa.py's cached attention (which
materializes [T, cap+T] logits in HBM — ~140 MB/layer at the deployed
config) with an online-softmax kernel. TPU counterpart of the reference's
FlashAttention-2 sliding-window path (modeling_infinitevl.py:1028,1067-1108).

Structure: grid (B, Hkv, NK) with the KV-block axis innermost; TPU grids
iterate sequentially, so the fp32 accumulator / running-max / running-sum
scratch persists across KV blocks and the output block is written on the
last one — the canonical TPU flash pattern (no in-kernel loops, fast Mosaic
compiles, BlockSpec-pipelined KV streaming from HBM).

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
    q_ref,  # [1, 1, R, D]  rows r = t*G + g
    k_ref,  # [1, 1, block_k, D]
    v_ref,  # [1, 1, block_k, D]
    # outputs
    o_ref,  # [1, 1, R, D]
    # scratch (persists across the sequential KV-block grid axis)
    acc_ref,  # [R, D] f32
    m_ref,  # [R, 128] f32
    l_ref,  # [R, 128] f32
    *,
    window: int,
    block_k: int,
    cap: int,
    t_real: int,
    groups: int,
    scale: float,
):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    R, D = q_ref.shape[2], q_ref.shape[3]
    cum_len = cum_len_ref[0]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0]
    s = jnp.dot(q, k.T.astype(jnp.float32), preferred_element_type=jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 0)
    qp = cum_len + row // groups
    flat = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 1)
    m0 = (cum_len - 1) % cap
    ring_kp = cum_len - 1 - jnp.mod(m0 - flat, cap)
    new_off = flat - cap
    new_kp = jnp.where(new_off < t_real, cum_len + new_off, -1)
    kp = jnp.where(flat < cap, jnp.where(ring_kp >= 0, ring_kp, -1), new_kp)
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


@functools.partial(
    jax.jit, static_argnames=("window", "scale", "block_k", "interpret")
)
def swa_ring_flash_attention(
    q: jax.Array,  # [B, T, Hq, D]
    new_k: jax.Array,  # [B, T, Hkv, D]
    new_v: jax.Array,
    ring_k: jax.Array,  # [B, cap, Hkv, D], cap % block_k == 0
    ring_v: jax.Array,
    cum_len: jax.Array,  # scalar int32
    window: int,
    scale: Optional[float] = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over (ring ++ current) with the sliding-window mask.
    Returns [B, T, Hq, D]. Numerics match ops.swa.swa_cached_attention."""
    B, T, Hq, D = q.shape
    Hkv = new_k.shape[2]
    G = Hq // Hkv
    cap = ring_k.shape[1]
    if cap % block_k:
        raise ValueError(f"ring capacity {cap} must be a multiple of {block_k}")
    if scale is None:
        scale = D**-0.5
    Tp = ((T + block_k - 1) // block_k) * block_k
    pad = Tp - T
    kn = jnp.pad(new_k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vn = jnp.pad(new_v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    # head-major [B, Hkv, cap+Tp, D]
    keys = jnp.concatenate([ring_k, kn], axis=1).transpose(0, 2, 1, 3)
    vals = jnp.concatenate([ring_v, vn], axis=1).transpose(0, 2, 1, 3)
    R = T * G
    qg = q.reshape(B, T, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, R, D)

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
            grid=(B, Hkv, NK),
            in_specs=[
                pl.BlockSpec((1, 1, R, D), lambda b, h, j, c: (b, h, 0, 0)),
                pl.BlockSpec(
                    (1, 1, block_k, D), lambda b, h, j, c: (b, h, j, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, D), lambda b, h, j, c: (b, h, j, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, R, D), lambda b, h, j, c: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((R, D), jnp.float32),
                pltpu.VMEM((R, 128), jnp.float32),
                pltpu.VMEM((R, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, D), q.dtype),
        interpret=interpret,
    )(cum_len.reshape(1), qg, keys, vals)
    out = out.reshape(B, Hkv, T, G, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, Hq, D)
