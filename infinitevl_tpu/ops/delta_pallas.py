"""Fused Pallas kernel for the chunkwise gated delta rule (inference fwd).

Replaces the XLA multi-op pipeline of ops/delta_rule.delta_rule_chunk for
the cached prefill path: one kernel per (batch, head) streams the chunks
sequentially (innermost grid axis) with the recurrent state resident in a
VMEM scratch buffer, computing the WY/UT transform, the Newton-Schulz
unit-lower inverse, intra/inter-chunk outputs and the state update without
materializing any [.., C, C] intermediates in HBM. Counterpart of the
reference's chunk_gated_delta_rule Triton pipeline
(fla/ops/gated_delta_rule/chunk.py:18-393 / wy_fast.py / chunk_delta_h.py).

Math (see ops/delta_rule.py for the derivation):
    A[i,j] = beta_i <k_i, k_j> exp(g_i - g_j)   (j < i, within chunk)
    X      = (I + A)^{-1}
    Y      = X @ (beta*(V - b*K S))   computed as  u - w @ S
    o      = diag(b) (scale Q) S + (tril(Q K^T) * exp(g_i - g_j)) Y
    S'     = exp(g_C) S + (K * exp(g_C - g))^T Y

q/k are L2-normalized in-kernel (use_qk_l2norm_in_kernel=True semantics).
Inference only (no VJP); training uses the differentiable XLA path.

PERFORMANCE NOTE (measured on v5e, B=1, H=16, T=257): this kernel is
~9x SLOWER than the XLA chunk path (5.1 ms vs 0.56 ms). The TPU Pallas grid
executes sequentially on the single core, so the (B, H, N) = 80 tiny grid
steps serialize matmuls that XLA batches across heads in one call; at these
shapes the delta recurrence is overhead-bound, not memory-bound, and fusion
buys nothing. Kept as a reference implementation and for future large-batch
serving shapes where per-cell work amortizes; the model integration
deliberately uses ops/delta_rule.delta_rule_chunk.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _delta_kernel(
    q_ref,  # [1, 1, 1, C, K]
    k_ref,  # [1, 1, 1, C, K]
    v_ref,  # [1, 1, 1, C, V]
    aux_ref,  # [1, 1, 1, 8, C] f32: row0 = within-chunk cumsum(g), row1 = beta
    h0_ref,  # [1, 1, K, V] f32 initial state
    o_ref,  # [1, 1, 1, C, V]
    hT_ref,  # [1, 1, K, V] f32 final state
    s_ref,  # scratch [K, V] f32
    *,
    scale: float,
    n_newton: int,
):
    n = pl.program_id(2)
    nn = pl.num_programs(2)
    C, K = q_ref.shape[3], q_ref.shape[4]
    V = v_ref.shape[4]

    @pl.when(n == 0)
    def _init():
        s_ref[:] = h0_ref[0, 0]

    q = q_ref[0, 0, 0].astype(jnp.float32)
    k = k_ref[0, 0, 0].astype(jnp.float32)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    gcs = aux_ref[0, 0, 0, 0, :]  # [C]
    beta = aux_ref[0, 0, 0, 1, :]  # [C]

    # in-kernel qk L2 norm (l2norm.py semantics: x * rsqrt(sum x^2 + eps))
    q = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-6)
    k = k * jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-6)
    q = q * scale

    gi = gcs[:, None]
    gj = gcs[None, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    ratio = jnp.where(col <= row, jnp.exp(jnp.minimum(gi - gj, 0.0)), 0.0)
    stril = col < row

    kk = jnp.dot(k, k.T, preferred_element_type=jnp.float32)
    a = jnp.where(stril, kk * ratio, 0.0) * beta[:, None]

    # Newton-Schulz exact inverse of (I + a); seed I - a squares the residual
    eye = jnp.eye(C, dtype=jnp.float32)
    l = eye + a
    x = eye - a
    for _ in range(n_newton):
        x = jnp.dot(
            x,
            2.0 * eye - jnp.dot(l, x, preferred_element_type=jnp.float32),
            preferred_element_type=jnp.float32,
        )

    b = jnp.exp(gcs)  # [C], <= 1
    bend = jnp.exp(gcs[C - 1])
    kb = k * (beta * b)[:, None]
    vb = v * beta[:, None]
    w = jnp.dot(x, kb, preferred_element_type=jnp.float32)  # [C, K]
    u = jnp.dot(x, vb, preferred_element_type=jnp.float32)  # [C, V]

    s = s_ref[:]
    y = u - jnp.dot(w, s, preferred_element_type=jnp.float32)  # [C, V]

    qb = q * b[:, None]
    o_inter = jnp.dot(qb, s, preferred_element_type=jnp.float32)
    attn = jnp.where(
        col <= row, jnp.dot(q, k.T, preferred_element_type=jnp.float32) * ratio, 0.0
    )
    o = o_inter + jnp.dot(attn, y, preferred_element_type=jnp.float32)
    o_ref[0, 0, 0] = o.astype(o_ref.dtype)

    k_out = k * jnp.exp(gcs[C - 1] - gcs)[:, None]
    s_ref[:] = s * bend + jnp.dot(
        k_out.T, y, preferred_element_type=jnp.float32
    )

    @pl.when(n == nn - 1)
    def _finish():
        hT_ref[0, 0] = s_ref[:]


@functools.partial(
    jax.jit, static_argnames=("scale", "chunk_size", "interpret")
)
def delta_rule_chunk_fused(
    q: jax.Array,  # [B, T, H, K]
    k: jax.Array,
    v: jax.Array,  # [B, T, H, V]
    g: jax.Array,  # [B, T, H] log-decay (fp32)
    beta: jax.Array,  # [B, T, H]
    initial_state: Optional[jax.Array] = None,  # [B, H, K, V] f32
    scale: Optional[float] = None,
    chunk_size: int = 64,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused forward. Returns (o [B,T,H,V], final_state [B,H,K,V] f32).
    Numerics match ops.delta_rule.delta_rule_chunk (l2norm applied)."""
    B, T, H, K = q.shape
    V = v.shape[-1]
    C = chunk_size
    if scale is None:
        scale = K**-0.5
    pad = (-T) % C
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        beta = jnp.pad(beta, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    N = Tp // C

    def chunked(x, d):
        # [B, Tp, H, d] -> [B, H, N, C, d]
        return x.reshape(B, N, C, H, d).transpose(0, 3, 1, 2, 4)

    qc = chunked(q, K)
    kc = chunked(k, K)
    vc = chunked(v, V)
    gf = g.astype(jnp.float32).reshape(B, N, C, H).transpose(0, 3, 1, 2)
    bf = beta.astype(jnp.float32).reshape(B, N, C, H).transpose(0, 3, 1, 2)
    gcs = jnp.cumsum(gf, axis=-1)
    aux = jnp.zeros((B, H, N, 8, C), jnp.float32)
    aux = aux.at[:, :, :, 0, :].set(gcs)
    aux = aux.at[:, :, :, 1, :].set(bf)

    if initial_state is None:
        h0 = jnp.zeros((B, H, K, V), jnp.float32)
    else:
        h0 = initial_state.astype(jnp.float32)

    import math

    n_newton = max(int(math.ceil(math.log2(max(C, 2)))) - 1, 0)

    o, hT = pl.pallas_call(
        functools.partial(_delta_kernel, scale=scale, n_newton=n_newton),
        grid=(B, H, N),
        in_specs=[
            pl.BlockSpec((1, 1, 1, C, K), lambda b, h, n: (b, h, n, 0, 0)),
            pl.BlockSpec((1, 1, 1, C, K), lambda b, h, n: (b, h, n, 0, 0)),
            pl.BlockSpec((1, 1, 1, C, V), lambda b, h, n: (b, h, n, 0, 0)),
            pl.BlockSpec((1, 1, 1, 8, C), lambda b, h, n: (b, h, n, 0, 0)),
            pl.BlockSpec((1, 1, K, V), lambda b, h, n: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, C, V), lambda b, h, n: (b, h, n, 0, 0)),
            pl.BlockSpec((1, 1, K, V), lambda b, h, n: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, C, V), v.dtype),
            jax.ShapeDtypeStruct((B, H, K, V), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((K, V), jnp.float32)],
        interpret=interpret,
    )(qc, kc, vc, aux, h0)
    # [B, H, N, C, V] -> [B, T, H, V]
    o = o.transpose(0, 2, 3, 1, 4).reshape(B, Tp, H, V)[:, :T]
    return o, hT


# ---------------------------------------------------------------------------
# Fused single-token decode step over the STACKED state.
#
# The XLA decode step issues ~10 small ops per layer (two reductions over
# the state, decay+rank-1 update, scalar assembly), each paying dispatch
# overhead; at B=8 the delta layers measure ~186 us/layer against a ~41 us
# state-bandwidth floor. This kernel does the whole step in ONE grid cell
# per batch row, with the state block read from / written to the stacked
# [L, B, H, K, V] array in place (input/output aliased) — the same
# stacked-state discipline as swa_ring_flash_decode_stacked.
# ---------------------------------------------------------------------------


def _delta_step_kernel(
    q_ref,  # [1, H, K] f32 (scaled, post-l2norm)
    k_ref,  # [1, H, K] f32
    v_ref,  # [1, H, V] f32
    eg_ref,  # [1, H, 128] f32  exp(g) broadcast along lanes (layout rule)
    beta_ref,  # [1, H, 128] f32
    h_ref,  # [1, 1, H, K, V] f32 block of the stacked state (aliased out)
    o_ref,  # [1, H, V]
    h_out_ref,  # [1, 1, H, K, V]
    *,
    heads: int,
):
    # static per-head unroll of 2D ops: Mosaic's vector-layout inference
    # rejects the 3D broadcast formulation ("unsupported shape cast")
    for hh in range(heads):
        hmat = h_ref[0, 0, hh]  # [K, V]
        q2 = q_ref[0, hh : hh + 1]  # [1, K]
        k2 = k_ref[0, hh : hh + 1]
        v2 = v_ref[0, hh : hh + 1]  # [1, V]
        eg = eg_ref[0, hh, 0]
        beta = beta_ref[0, hh, 0]
        qh = jnp.dot(q2, hmat, preferred_element_type=jnp.float32)  # [1, V]
        kh = jnp.dot(k2, hmat, preferred_element_type=jnp.float32)
        verr = (v2 - eg * kh) * beta  # [1, V]
        outer = jnp.dot(
            k2.T, verr, preferred_element_type=jnp.float32
        )  # [K, V]
        h_out_ref[0, 0, hh] = hmat * eg + outer
        qdotk = jnp.sum(q2 * k2)
        o_ref[0, hh] = (eg * qh + qdotk * verr)[0]


@functools.partial(jax.jit, static_argnames=("layer", "scale", "interpret"))
def delta_step_fused_stacked(
    q: jax.Array,  # [B, H, K] post-conv raw projections (pre-l2norm)
    k: jax.Array,
    v: jax.Array,  # [B, H, V]
    g: jax.Array,  # [B, H] log-decay
    beta: jax.Array,  # [B, H]
    stacked_h: jax.Array,  # [L, B, H, K, V] f32 (donate for in-place)
    layer: int,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step for DeltaNet layer `layer` of the stacked state.

    Semantics identical to ops.delta_rule.delta_rule_step (incl. the qk
    l2norm); returns (o [B, H, V] in v.dtype, stacked_h'). The stacked
    state is aliased input->output: only layer `layer`'s block is touched.
    """
    from .norms import l2norm

    B, H, K = q.shape
    V = v.shape[-1]
    if scale is None:
        scale = K**-0.5
    qf = (l2norm(q).astype(jnp.float32)) * scale
    kf = l2norm(k).astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # lane-broadcast the per-head scalars: Mosaic block shapes need the
    # trailing dim to be 128-divisible (or the full array dim)
    eg = jnp.broadcast_to(
        jnp.exp(g.astype(jnp.float32))[..., None], (B, H, 128)
    )
    bf = jnp.broadcast_to(beta.astype(jnp.float32)[..., None], (B, H, 128))
    o, stacked_h = pl.pallas_call(
        functools.partial(_delta_step_kernel, heads=H),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, V), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, H, K, V), lambda b: (layer, b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, V), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, H, K, V), lambda b: (layer, b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, V), jnp.float32),
            jax.ShapeDtypeStruct(stacked_h.shape, jnp.float32),
        ],
        input_output_aliases={5: 1},
        interpret=interpret,
    )(qf, kf, vf, eg, bf, stacked_h)
    return o.astype(v.dtype), stacked_h
