"""Probe: fused Pallas int4 unpack-matmul vs the XLA int4 path vs int8.

Hypothesis (ops/int4_pallas.py header): XLA's two nibble-plane
contractions re-read the packed table twice, so int4 decode loses to int8
despite half the bytes. The fused kernel reads each packed block once.

Measures an MLP-shaped chained pair (x -> [2048, 11008] -> [11008, 2048]
-> feedback) at M=1 — the decode-shaped weight-read workload — for:
  int8 XLA, int4 XLA (G=1 and G=128), int4 fused (G=1 and G=128).
Weight bytes per pair: bf16 90.2 MB, int8 45.1, int4 22.5 (+ scales).

Run on the real chip: python scripts/probe_int4_pallas.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu.models.quant import (
    int4_matmul,
    quantize_kernel,
    quantize_kernel_int4,
)
from infinitevl_tpu.ops.int4_pallas import int4_matmul_fused
from infinitevl_tpu.utils.benchlib import device_time_ms_min

D, F = 2048, 11008
M = 1


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    w_up = jnp.asarray(rng.randn(D, F) * 0.02, jnp.float32)
    w_dn = jnp.asarray(rng.randn(F, D) * 0.02, jnp.float32)
    x0 = jnp.asarray(rng.randn(M, D), jnp.bfloat16)

    def pair_step(fn_up, fn_dn):
        def step(x):
            h = fn_up(x).astype(jnp.bfloat16)
            y = fn_dn(h).astype(jnp.bfloat16)
            # bounded feedback keeps the chain numerically alive
            return jnp.tanh(y)

        return step

    results = {}

    # --- int8 XLA reference point
    q8_up = jax.tree.map(jnp.asarray, quantize_kernel(w_up))
    q8_dn = jax.tree.map(jnp.asarray, quantize_kernel(w_dn))

    def int8_mm(x, n):
        return (x @ n["kernel_q"].astype(x.dtype)) * n["scale"].astype(x.dtype)

    s8 = jax.jit(pair_step(lambda x: int8_mm(x, q8_up), lambda h: int8_mm(h, q8_dn)))
    results["int8_xla"] = device_time_ms_min(s8, x0, n1=20, n2=120)
    log(f"int8 XLA pair: {results['int8_xla']:.3f} ms")

    for gs, tag in ((1 << 30, "g1"), (128, "g128")):
        q4_up = jax.tree.map(jnp.asarray, quantize_kernel_int4(w_up, gs))
        q4_dn = jax.tree.map(jnp.asarray, quantize_kernel_int4(w_dn, gs))

        s4x = jax.jit(
            pair_step(lambda x: int4_matmul(x, q4_up), lambda h: int4_matmul(h, q4_dn))
        )
        results[f"int4_xla_{tag}"] = device_time_ms_min(s4x, x0, n1=20, n2=120)
        log(f"int4 XLA {tag} pair: {results[f'int4_xla_{tag}']:.3f} ms")

        t0 = time.time()
        s4p = jax.jit(
            pair_step(
                lambda x: int4_matmul_fused(x, q4_up),
                lambda h: int4_matmul_fused(h, q4_dn),
            )
        )
        out = jax.block_until_ready(s4p(x0))  # mosaic compile
        log(f"  fused {tag} compiled in {time.time()-t0:.0f}s")
        # correctness spot-check on chip before timing
        ref = jax.block_until_ready(s4x(x0))
        err = float(
            jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
        )
        log(f"  fused {tag} max abs diff vs XLA path: {err:.2e}")
        results[f"int4_fused_{tag}"] = device_time_ms_min(s4p, x0, n1=20, n2=120)
        log(f"int4 FUSED {tag} pair: {results[f'int4_fused_{tag}']:.3f} ms")

    # roofline context: bf16 pair for the byte-scaling sanity line
    sb = jax.jit(pair_step(lambda x: x @ w_up.astype(x.dtype), lambda h: h @ w_dn.astype(h.dtype)))
    results["bf16"] = device_time_ms_min(sb, x0, n1=20, n2=120)
    log(f"bf16 pair: {results['bf16']:.3f} ms")

    log("\nsummary (ms per 90.2MB-bf16-equivalent pair):")
    for k, v in results.items():
        log(f"  {k:>16}: {v:.3f}")


if __name__ == "__main__":
    main()
