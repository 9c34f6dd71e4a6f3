"""Weight-only int8 quantization for serving.

The B=1 decode floor on a v5e is the weight read: ~7.4 GB bf16 at 819 GB/s
= 9.0 ms/token (measured 10.6 ms end-to-end, BENCH_r02). Storing the large
projection matrices as int8 with per-output-channel scales halves the bytes
the decode step must stream; XLA fuses the int8->bf16 convert and the
per-column scale into the dot's operand read, so no dequantized copy ever
lands in HBM.

This is the TPU answer to the reference's CUDA-ecosystem quantized loading
(src/llamafactory/model/model_utils/quantization.py — GPTQ/AWQ/bnb are
kernel-specific and N/A here): same capability (serve a 3B in int8),
hardware-native mechanism.

Per-channel symmetric scheme: w[:, j] ~= q[:, j] * scale[j], q in [-127,
127], scale = max|w[:, j]| / 127. Matmul helpers (models/text._dense /
models/vision._dense) detect 'kernel_q' and compute
(x @ q.astype(x.dtype)) * scale — column scales commute with the
contraction, so this is exact dequant-then-matmul.

int4 variant (bits=4): group-wise scales over 128 input rows per output
column (AWQ/GPTQ granularity), nibble-packed by hand into uint8 (two
weights per HBM byte — see quantize_kernel_int4 for why not jnp.int4),
halving the weight read again vs int8. int4_matmul contracts each nibble
plane against the matching activation half with ordinary dots.

MEASURED (one v5e, 3B, 500K ctx decode; scripts/probe_int4.py +
probe_int4_g1.py): int4 is a LATENCY LOSS vs int8 at every setting —
group-128 scales 13.3 ms/step B=1 (75 tok/s), per-column scales (G=1,
group_size >= d_in) 8.24 ms (121), vs int8 6.0 ms (167) and bf16 10.4
(96). The G=1 path is the one worth using when int4 is chosen for memory
AND latency matters: two plain dots + one column scale, same fusion shape
as int8 (group scales cost +62%: the per-group batched dots break the
single big MXU contraction). Biased-nibble storage (kernel_q4b, no
sign-fix selects) was probed and FALSIFIED as a lever: 13.19 ms at G=128
(noise vs 13.34) and 9.08 at G=1 (worse than signed 8.24) — the unpack's
select chain was never the bottleneck. int4's value on this chip is
MEMORY (2.8 GB weights: bigger batches, longer contexts, QLoRA frozen
bases); int8 stays the recommended serving default.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# Projections worth quantizing: the large 2D matmuls. Norm/conv/bias/rope
# leaves stay high precision (tiny), as do the embedding (gather reads only
# touched rows) unless quantize_embed is set (the tied lm_head matmul reads
# all vocab x hidden bytes every token).
DEFAULT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "a_proj", "b_proj", "g_proj",
    "gate", "up", "down", "dt_proj", "qkv", "proj", "fc1", "fc2",
    "gate_up", "qkv_proj", "fused_proj",
)


def quantize_kernel(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8: returns {'kernel_q', 'scale'}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)  # [d_out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale.astype(jnp.float32)}


def dequantize_kernel(node: Dict[str, jax.Array], dtype=jnp.bfloat16):
    return (
        node["kernel_q"].astype(jnp.float32) * node["scale"][None, :]
    ).astype(dtype)


def quantize_embed_rows(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-ROW symmetric int8 for the embedding table plus a PRE-TRANSPOSED
    int8 copy for the tied lm_head: w[i, :] ~= q[i, :] * scale[i].

    The tied lm_head matmul reads the FULL vocab x hidden table every
    decoded token (622 MB bf16 at 3B), which is why the table is worth
    quantizing even though the embedding *gather* only touches selected
    rows. Row scales are per-LOGIT column scales of the head operand, so
    they commute with the contraction exactly.

    Why TWO int8 copies ([vocab, hidden] for the gather, [hidden, vocab]
    for the head): contracting the [vocab, hidden] int8 table on its
    hidden axis forces a per-step layout change — measured 10.89 ms/tok
    vs plain int8's 6.81 (scripts/probe_decode_matrix.py), i.e. the
    "saved" transpose cost MORE than the bf16 table read it replaced
    (XLA streams a transposed bf16 dot operand natively; the int8
    convert+transpose does not fuse). Materializing the transpose once
    at quant time makes the head dot a plain [D] x [D, V] contraction.
    Both copies together are 622 MB — exactly the bf16 table they
    replace, and the per-token HEAD read halves to 311 MB.

    `scale` is stored in w.dtype (not fp32): embed_tokens' output dtype —
    and the activation dtype inferred by Generator/StreamingEngine when
    none is passed — is then carried by the scale leaf. The bf16 scale
    rounding (<= 2^-9 relative) is quantized INTO q (q is computed
    against the stored scale), so it costs nothing beyond the int8
    rounding itself."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1)  # [vocab]
    scale = (jnp.maximum(amax, 1e-8) / 127.0).astype(w.dtype)
    q = jnp.clip(
        jnp.round(wf / scale.astype(jnp.float32)[:, None]), -127, 127
    ).astype(jnp.int8)
    return {"embed_q": q, "embed_scale": scale, "head_q": q.T}


def quantize_kernel_int4(
    w: jax.Array, group_size: int = 128, biased: bool = False
) -> Dict[str, jax.Array]:
    """Group-wise symmetric int4, nibble-packed into uint8.

    Storage is ``kernel_q4``: uint8 [d_in//2, d_out] — row r of the packed
    array carries original row r in its LOW nibble and row r + d_in//2 in
    its HIGH nibble, so the decode weight read is a quarter of bf16. The
    half-split pairing (not interleaved pairs) lets the matmul helper
    contract each nibble plane against the matching half of the activation
    with ORDINARY dots — the unpack is pure elementwise on the dot operand,
    which XLA fuses into the read. (jnp.int4 arrays would bit-pack natively,
    but S4 jit ARGUMENTS hit an infinite device_put/layout recursion on the
    TPU PJRT backend — RecursionError "Recursively calling jit" — so the
    packing is done by hand.)

    Group-wise scales (AWQ/GPTQ granularity; the reference's 4-bit
    quantized loading lives in model_utils/quantization.py):
    w[g*gs:(g+1)*gs, j] ~= q * scale[g, j], q in [-7, 7]. Groups must not
    straddle the half-split; when d_in//2 is not a multiple of group_size
    the whole column becomes one group."""
    wf = w.astype(jnp.float32)
    d_in, d_out = wf.shape
    if d_in % 2:
        raise ValueError(f"int4 packing needs even d_in, got {d_in}")
    if (d_in // 2) % group_size:
        group_size = d_in
    G = d_in // group_size
    wg = wf.reshape(G, group_size, d_out)
    amax = jnp.max(jnp.abs(wg), axis=1)  # [G, d_out]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    q = q.reshape(d_in, d_out).astype(jnp.int32)
    half = d_in // 2
    if biased:
        # store q+7 in [0,14]: the unpack needs no sign-fix selects
        # (kernel_q4b key switches the matmul helper's unpack path)
        qb = q + 7
        packed = (qb[:half] & 0xF) | ((qb[half:] & 0xF) << 4)
        return {
            "kernel_q4b": packed.astype(jnp.uint8),
            "scale4": scale.astype(jnp.float32),
        }
    packed = (q[:half] & 0xF) | ((q[half:] & 0xF) << 4)
    return {
        "kernel_q4": packed.astype(jnp.uint8),
        "scale4": scale.astype(jnp.float32),
    }


def unpack_int4(packed: jax.Array, dtype=jnp.bfloat16, biased: bool = False):
    """[d_in//2, d_out] uint8 -> (lo, hi) each [d_in//2, d_out] in `dtype`,
    values in [-7, 7]. Pure elementwise (fuses into a dot's operand read).

    `biased` storage keeps q+7 in [0, 14] so the unpack is mask/shift/
    convert/subtract with NO sign-fix selects — probed as a lever against
    the VPU-bound unpack chain (scripts/probe_int4_g1.py)."""
    if biased:
        lo = (packed & 0xF).astype(dtype) - jnp.asarray(7, dtype)
        hi = (packed >> 4).astype(dtype) - jnp.asarray(7, dtype)
        return lo, hi
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return lo.astype(dtype), hi.astype(dtype)


def int4_matmul(x: jax.Array, node: Dict[str, jax.Array]) -> jax.Array:
    """x @ dequant(node) with the packed layout above; exact dequant-then-
    matmul (group scales commute with the within-group contraction).

    The group scales are applied to the per-group dot OUTPUTS, never to the
    weight operand: scaling the operand needs a reshape-multiply-reshape
    between the nibble unpack and the dot, which XLA materializes instead
    of fusing into the weight read — measured 14.8 ms/tok B=1 decode vs
    8.3 ms with output-side scales (one v5e, 3B @500K; scripts/probe_int4).
    Each nibble plane runs as ONE G/2-batched dot over [gs]-row groups, so
    the unpack stays pure elementwise on the operand and the scale lands on
    the tiny [G/2, M, d_out] per-group results."""
    biased = "kernel_q4b" in node
    q = node["kernel_q4b"] if biased else node.get("kernel_q4", node.get("kernel_q4f"))
    s = node["scale4"]
    half, d_out = q.shape
    lo, hi = unpack_int4(q, x.dtype, biased=biased)
    s = s.astype(x.dtype)
    G = s.shape[0]
    if G == 1:
        return (x[..., :half] @ lo + x[..., half:] @ hi) * s[0]
    lead = x.shape[:-1]
    g2 = G // 2
    gs = half // g2

    def plane(xh, w, sh):
        # xh [..., half] @ (w [half, d_out] group-scaled by sh [g2, d_out])
        xg = xh.reshape(-1, g2, gs).transpose(1, 0, 2)  # [g2, M, gs]
        wg = w.reshape(g2, gs, d_out)  # row-major: layout-compatible bitcast
        yg = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((0,), (0,)))
        )  # [g2, M, d_out]
        return (yg * sh[:, None, :]).sum(0)

    y = plane(x[..., :half], lo, s[:g2]) + plane(x[..., half:], hi, s[g2:])
    return y.reshape(*lead, d_out)


def prefer_fused_int4(params: Params) -> Params:
    """Rekey eligible int4 nodes kernel_q4 -> kernel_q4f so the dense
    helpers dispatch them through the fused Pallas unpack-matmul
    (ops/int4_pallas.py) instead of the XLA dual-plane dots.

    OPT-IN ONLY, and measured SLOWER at B=1 decode (12.61 vs the XLA
    path's 10.62 ms/tok at 3B — ops/int4_pallas.py docstring has the
    breakdown); shipped as the recorded falsification of the fused-kernel
    lever, not as a serving mode.

    A DIFFERENT key (not a flag) keeps jit caches honest: the dispatch is
    a trace-time pytree-structure decision, so toggling can never serve a
    stale compiled path. Eligibility = the kernel's tiling contract
    (half and d_out multiples of 128; grouped scales need the per-plane
    block = d_in/G to be a multiple of 32 sublanes). Ineligible nodes
    keep the XLA path. Structure-preserving otherwise; TPU-only (Mosaic
    kernels do not lower on the CPU backend — keep the XLA keys there)."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "kernel_q4" and getattr(v, "ndim", 0) == 2:
                    half, d_out = v.shape
                    G = node["scale4"].shape[0]
                    bk_in = 128 if G == 1 else (2 * half) // G
                    ok = (
                        half % 128 == 0
                        and d_out % 128 == 0
                        and half % bk_in == 0
                        and bk_in % 32 == 0
                    )
                    out["kernel_q4f" if ok else "kernel_q4"] = v
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def dequantize_kernel_int4(node: Dict[str, jax.Array], dtype=jnp.bfloat16):
    biased = "kernel_q4b" in node
    q = node["kernel_q4b"] if biased else node.get("kernel_q4", node.get("kernel_q4f"))
    s = node["scale4"]
    half, d_out = q.shape
    lo, hi = unpack_int4(q, jnp.float32, biased=biased)
    w = jnp.concatenate([lo, hi], axis=0)
    G = s.shape[0]
    wg = w.reshape(G, 2 * half // G, d_out) * s[:, None, :]
    return wg.reshape(2 * half, d_out).astype(dtype)


def quantize_params(
    params: Params,
    targets: Sequence[str] = DEFAULT_TARGETS,
    min_size: int = 65536,
    bits: int = 8,
    group_size: int = 128,
    int4_biased: bool = False,
    quantize_embed: bool = False,
) -> Params:
    """Replace each targeted dense node's 'kernel' with int8 (per-channel)
    or int4 (group-wise) + scales.

    Structure-preserving otherwise; nodes smaller than `min_size` elements
    keep full precision (scales/overhead would dominate).

    `quantize_embed` additionally converts the text `embed` table (and an
    untied `lm_head`, when present) to row-wise int8 via
    quantize_embed_rows — always int8, even at bits=4: the gather path
    cannot use the half-split nibble packing (rows are split across the
    two nibble planes). Serving-only: training steps (train/step.py) read
    `params["embed"]` directly and there is no embed gradient path through
    the quantized leaves."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def quant(kernel):
        if bits == 4 and kernel.shape[0] % 2 == 0:
            return quantize_kernel_int4(kernel, group_size, biased=int4_biased)
        return quantize_kernel(kernel)  # odd d_in can't nibble-pack

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in targets
                    and isinstance(v, dict)
                    and "kernel" in v
                    and getattr(v["kernel"], "ndim", 0) == 2
                    and v["kernel"].size >= min_size
                ):
                    new = {kk: vv for kk, vv in v.items() if kk != "kernel"}
                    new.update(quant(v["kernel"]))
                    out[k] = new
                elif (
                    quantize_embed
                    and k == "embed"
                    and getattr(v, "ndim", 0) == 2
                    and v.size >= min_size
                ):
                    out.update(quantize_embed_rows(v))
                elif (
                    quantize_embed
                    and k == "lm_head"
                    and getattr(v, "ndim", 0) == 2
                    and v.size >= min_size
                ):
                    # untied head [hidden, vocab] is already in the
                    # contraction-native layout: per-output-column int8
                    # (same scheme as the projections)
                    qn = quantize_kernel(v)
                    out["lm_head_q"] = qn["kernel_q"]  # [hidden, vocab]
                    out["lm_head_scale"] = qn["scale"].astype(v.dtype)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def quantized_bytes(params: Params) -> int:
    def nbytes(x):
        if x.dtype in (jnp.int4, jnp.uint4):
            return x.size // 2  # bit-packed: two weights per byte
        return x.size * x.dtype.itemsize

    return sum(nbytes(x) for x in jax.tree.leaves(params))
