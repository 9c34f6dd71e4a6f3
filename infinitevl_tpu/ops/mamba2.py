"""Mamba2 SSD (state-space duality) scan, chunkwise on the MXU.

The reference's second conversion mixer (fla/layers/mamba2_new.py:165-255,
driven by model/convert.py:90-140) computes, per head with state h in
R^{N x P}:

    a_t = exp(A * dt_t)                      (A < 0 scalar per head)
    h_t = a_t * h_{t-1} + dt_t * B_t x_t^T   (outer product update)
    y_t = C_t^T h_t  (+ D * x_t skip)

This is the gated-linear-attention family (a DeltaNet without the delta
correction), so the TPU mapping is the same chunkwise dual form as
ops/delta_rule.py: within a chunk the causal interaction is one [C, C]
matmul; across chunks a small recurrent state hop — everything MXU-shaped,
scanned with lax.scan.

No Triton/CUDA counterpart is used: mamba_chunk_scan_combined is replaced by
this dual form, validated against a float64 naive recurrence in tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mamba2_recurrent(
    x: jax.Array,  # [B, T, H, P] values
    dt: jax.Array,  # [B, T, H] raw (pre-softplus, pre-bias applied by caller)
    A: jax.Array,  # [H] negative decay rates
    B_: jax.Array,  # [B, T, H, N]
    C_: jax.Array,  # [B, T, H, N]
    initial_state: Optional[jax.Array] = None,  # [B, H, N, P]
) -> Tuple[jax.Array, jax.Array]:
    """Token-by-token reference recurrence (fp32). Used for decode steps and
    as the parity target for the chunk kernel."""
    Bsz, T, H, P = x.shape
    N = B_.shape[-1]
    h0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((Bsz, H, N, P), jnp.float32)
    )

    def body(h, ts):
        xt, dtt, bt, ct = ts  # [B,H,P], [B,H], [B,H,N], [B,H,N]
        a = jnp.exp(A[None] * dtt)  # [B,H]
        upd = (dtt[..., None] * bt)[..., None] * xt[..., None, :]  # [B,H,N,P]
        h = a[..., None, None] * h + upd
        y = jnp.einsum("bhn,bhnp->bhp", ct, h)
        return h, y

    xs = (
        x.transpose(1, 0, 2, 3).astype(jnp.float32),
        dt.transpose(1, 0, 2).astype(jnp.float32),
        B_.transpose(1, 0, 2, 3).astype(jnp.float32),
        C_.transpose(1, 0, 2, 3).astype(jnp.float32),
    )
    h, ys = jax.lax.scan(body, h0, xs)
    return ys.transpose(1, 0, 2, 3).astype(x.dtype), h


def mamba2_step(
    x: jax.Array,  # [B, H, P]
    dt: jax.Array,  # [B, H] (already softplus'd)
    A: jax.Array,  # [H]
    B_: jax.Array,  # [B, H, N]
    C_: jax.Array,  # [B, H, N]
    h: jax.Array,  # [B, H, N, P] fp32
) -> Tuple[jax.Array, jax.Array]:
    """Single decode step."""
    a = jnp.exp(A[None].astype(jnp.float32) * dt.astype(jnp.float32))
    upd = (dt.astype(jnp.float32)[..., None] * B_.astype(jnp.float32))[
        ..., None
    ] * x.astype(jnp.float32)[..., None, :]
    h = a[..., None, None] * h + upd
    y = jnp.einsum("bhn,bhnp->bhp", C_.astype(jnp.float32), h)
    return y.astype(x.dtype), h


def mamba2_chunk_scan(
    x: jax.Array,  # [B, T, H, P]
    dt: jax.Array,  # [B, T, H] (already softplus'd, >= 0)
    A: jax.Array,  # [H] negative
    B_: jax.Array,  # [B, T, H, N]
    C_: jax.Array,  # [B, T, H, N]
    initial_state: Optional[jax.Array] = None,
    chunk_size: int = 128,
    segment_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Chunkwise-dual SSD: O(T/C) sequential steps of [C, C] and [C, N|P]
    matmuls. Returns (y [B, T, H, P], final_state [B, H, N, P] fp32).

    Packing: `segment_ids` marks independent sequences (same design as
    ops/delta_rule.py): cross-segment interactions are masked inside the
    chunk, a boundary kills the incoming state carry, and only the chunk's
    final segment carries state out. `initial_state` seeds the first
    segment only."""
    Bsz, T, H, P = x.shape
    N = B_.shape[-1]
    Cn = chunk_size
    pad = (-T) % Cn
    if pad:
        # dt = 0 on pads: decay exp(0) = 1 and zero state injection
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B_ = jnp.pad(B_, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C_ = jnp.pad(C_, ((0, 0), (0, pad), (0, 0), (0, 0)))
        if segment_ids is not None:
            segment_ids = jnp.pad(segment_ids, ((0, 0), (0, pad)), mode="edge")
    Tp = T + pad
    K = Tp // Cn

    f32 = jnp.float32
    xc = x.reshape(Bsz, K, Cn, H, P).transpose(1, 0, 3, 2, 4).astype(f32)
    dtc = dt.reshape(Bsz, K, Cn, H).transpose(1, 0, 3, 2).astype(f32)
    bc = B_.reshape(Bsz, K, Cn, H, N).transpose(1, 0, 3, 2, 4).astype(f32)
    cc = C_.reshape(Bsz, K, Cn, H, N).transpose(1, 0, 3, 2, 4).astype(f32)
    if segment_ids is not None:
        sc = segment_ids.reshape(Bsz, K, Cn).transpose(1, 0, 2)  # [K,B,C]
        prev_last0 = sc[0, :, 0]  # first chunk continues "itself"
    else:
        sc = jnp.zeros((K, Bsz, Cn), jnp.int32)
        prev_last0 = sc[0, :, 0]

    Af = A.astype(f32)  # [H]
    causal = jnp.tril(jnp.ones((Cn, Cn), f32))
    h0 = (
        initial_state.astype(f32)
        if initial_state is not None
        else jnp.zeros((Bsz, H, N, P), f32)
    )

    def body(carry, ts):
        h, prev_last = carry
        xk, dtk, bk, ck, sk = ts  # [B,H,C,*], sk [B,C]
        # cumulative log-decay within the chunk (inclusive of t)
        g = Af[None, :, None] * dtk  # [B,H,C] log a_t
        L = jnp.cumsum(g, axis=-1)  # [B,H,C]
        # intra-chunk: y_t += sum_{s<=t} (C_t.B_s) exp(L_t - L_s) dt_s x_s
        scores = jnp.einsum("bhtn,bhsn->bhts", ck, bk)
        decay = jnp.exp(
            jnp.clip(L[..., :, None] - L[..., None, :], -60.0, 0.0)
        )
        M = scores * decay * causal[None, None] * dtk[..., None, :]
        same = (sk[:, :, None] == sk[:, None, :]).astype(f32)  # [B,C,C]
        M = M * same[:, None]
        y = jnp.einsum("bhts,bhsp->bhtp", M, xk)
        # inter-chunk h0 carry: only tokens still in the chunk's first
        # segment, and only if that segment continues the previous chunk
        cont = (sk[:, 0] == prev_last).astype(f32)  # [B]
        in_first = (sk == sk[:, :1]).astype(f32)
        no_bound = jnp.cumprod(in_first, axis=1)  # [B,C]
        h0_mask = no_bound * cont[:, None]
        y = y + jnp.einsum(
            "bhtn,bhnp->bhtp",
            ck * jnp.exp(L)[..., None] * h0_mask[:, None, :, None],
            h,
        )
        # state out: decayed h0 survives only a boundary-free continuing
        # chunk; injections only from the chunk's final segment
        Lc = L[..., -1]  # [B,H]
        carry_ok = no_bound[:, -1] * cont  # [B]
        w = jnp.exp(jnp.clip(Lc[..., None] - L, -60.0, 0.0)) * dtk  # [B,H,C]
        in_last = (sk == sk[:, -1:]).astype(f32)  # [B,C]
        w = w * in_last[:, None]
        h = (
            jnp.exp(Lc)[..., None, None] * h * carry_ok[:, None, None, None]
            + jnp.einsum("bhcn,bhcp->bhnp", bk * w[..., None], xk)
        )
        return (h, sk[:, -1]), y

    (h, _), ys = jax.lax.scan(body, (h0, prev_last0), (xc, dtc, bc, cc, sc))
    y = ys.transpose(1, 0, 3, 2, 4).reshape(Bsz, Tp, H, P)[:, :T]
    return y.astype(x.dtype), h
