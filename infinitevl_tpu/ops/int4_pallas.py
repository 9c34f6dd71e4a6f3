"""Pallas fused unpack-matmul for nibble-packed int4 weights.

Why a kernel: the XLA int4 path (models/quant.int4_matmul) computes the
two nibble-plane dots as separate HLO contractions, and each plane's
unpack chain re-reads the SAME packed uint8 array from HBM — int4's
whole point (quarter the weight bytes) is spent reading the 1.35 GB
packed table twice per token, which is exactly int8's read. Measured
consequence (BENCH_r03): int4 G=1 decode 8.24 ms/tok vs int8's 6.0 on a
step whose floor is the weight read. Here each packed block is DMA'd to
VMEM ONCE and both planes unpack from on-chip memory, so the HBM traffic
is the true quarter-rate read.

MEASURED VERDICT (round 4, scripts/probe_decode_matrix.py, one process,
median slopes, 3B @500K B=1): fused 12.61 ms/tok vs the XLA dual-dot
path's 10.62 vs int8's 5.80 — the kernel LOSES despite the byte math.
At M=1 each grid step is a (1, 128) x (128, bk_out) dot: the MXU is
~1/128 utilized and the per-block Mosaic overhead plus the VPU unpack
(int32 widen + mask/select over bk_in x bk_out lanes) dominate the HBM
bytes it saves; XLA's plane dots pipeline the uint8 reads well enough
that the second read is cheaper than this kernel's fixed costs. Kept
opt-in (models/quant.prefer_fused_int4, never default) as the recorded
falsification of ROUND3's "Pallas fused unpack-matmul" lever — int4
remains a memory-only option (2.35 GB vs int8's 4.06) and int8 stays
the serving default.

Unpack: widen the byte to int32 (Mosaic cannot legalize int8 vector
shifts), then mask/shift out the nibbles and sign-fix with one
compare-select each — all on native i32 lanes, entirely from VMEM.
Regression-tested against models/quant.unpack_int4.

Layout contract (models/quant.quantize_kernel_int4): packed uint8
[d_in//2, d_out], row r = original row r (low nibble) and row
r + d_in//2 (high nibble); scales [G, d_out] over contiguous d_in/G row
groups that never straddle the half split. Scales are applied per
in-block to the fp32 partial dot (output side — operand-side scaling
would defeat the fused read, models/quant.int4_matmul docstring), so
grouped scales ride the same path as per-column ones: in-block i of the
low plane is rows [i*bk, (i+1)*bk) = scale rows [i*bk/gs ...], and the
block size is chosen as gs (or 128 when G == 1) so each step sees exactly
one scale row per plane.

Grid (n_out, n_in), in-blocks innermost: TPU grids run sequentially, so
the fp32 accumulator scratch persists across the reduction axis and the
output block is written once on the last in-step — the same
revisited-output pattern as ops/swa_pallas.py. No in-kernel loops (grid
kernels Mosaic-compile ~50x faster through the remote relay).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_lo_ref, x_hi_ref, w_ref, s_ref, o_ref, acc_ref, *, hi_base):
    """hi_base == 0 means per-column scales (G == 1, scale row 0 for both
    planes); otherwise in-step i uses scale row i (low plane) and
    hi_base + i (high plane). The scale ref carries ALL G rows per
    out-block — G x bk_out fp32 is tiny, and a (1, bk_out) block would
    violate the sublane tiling rule for G > 1."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # unpack in int32: Mosaic has no int8 vector shifts (arith.shli on
    # vector<...xi8> fails to legalize), so widen first — the convert is
    # one op and the and/shift/compare chain runs on native i32 lanes
    b = w_ref[:].astype(jnp.int32)
    lo = b & 15
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(x_lo_ref.dtype)
    hi = b >> 4  # b is non-negative (from uint8), so this is the high nibble
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(x_lo_ref.dtype)
    d_lo = jnp.dot(x_lo_ref[:], lo, preferred_element_type=jnp.float32)
    d_hi = jnp.dot(x_hi_ref[:], hi, preferred_element_type=jnp.float32)
    if hi_base == 0:
        s_lo = s_hi = s_ref[0]
    else:
        s_lo = s_ref[i]
        s_hi = s_ref[hi_base + i]
    acc_ref[:] += (
        d_lo * s_lo.astype(jnp.float32) + d_hi * s_hi.astype(jnp.float32)
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _block_out(d_out: int) -> int:
    for cand in (1024, 512, 256, 128):
        if d_out % cand == 0:
            return cand
    raise ValueError(f"d_out {d_out} is not a multiple of 128")


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_2d(
    x: jax.Array,  # [M, d_in]
    packed: jax.Array,  # [d_in//2, d_out] uint8
    scale: jax.Array,  # [G, d_out]
    interpret: bool = False,
) -> jax.Array:
    M, d_in = x.shape
    half, d_out = packed.shape
    G = scale.shape[0]
    bk_in = 128 if G == 1 else (d_in // G)
    if half % bk_in:
        raise ValueError(f"half {half} not a multiple of in-block {bk_in}")
    bk_out = _block_out(d_out)
    n_in = half // bk_in
    grid = (d_out // bk_out, n_in)

    # scale row per plane per in-step: low plane rows [i*bk, ...) are scale
    # row i*bk/gs; with bk_in == gs that is row i (G>1) or row 0 (G==1);
    # the high plane starts at the half split = scale row G//2 (or 0)
    hi_base = 0 if G == 1 else G // 2

    out = pl.pallas_call(
        functools.partial(_kernel, hi_base=hi_base),
        out_shape=jax.ShapeDtypeStruct((M, d_out), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(  # x low half
                (M, bk_in), lambda j, i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(  # x high half
                (M, bk_in),
                lambda j, i, _n=n_in: (0, _n + i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # packed weights
                (bk_in, bk_out), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(  # all G scale rows for this out-block
                (G, bk_out), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (M, bk_out), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((M, bk_out), jnp.float32)],
        interpret=interpret,
    )(x, x, packed, scale)
    return out


def int4_matmul_fused(
    x: jax.Array, node: Dict[str, Any], interpret: bool = False
) -> jax.Array:
    """x @ dequant(node) through the fused Pallas kernel. Drop-in for
    models/quant.int4_matmul on signed (kernel_q4) storage; leading dims
    of x are flattened into the row axis."""
    packed = node.get("kernel_q4f", node.get("kernel_q4"))
    if packed is None:
        raise ValueError("fused int4 kernel needs signed kernel_q4 storage")
    scale = node["scale4"]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = _int4_matmul_2d(x2, packed, scale, interpret=interpret)
    return y.reshape(*lead, y.shape[-1])
