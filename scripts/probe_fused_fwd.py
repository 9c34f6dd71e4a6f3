"""Probe: existing fused Pallas delta fwd kernel at TRAINING shape.

delta_rule_chunk_fused measured 9x slower than XLA at T=257 (80 grid
cells, overhead-bound). At T=8192 / C=128 the grid is (1,16,64) = 1024
cells with 21 MXU matmuls each; this measurement decides whether a fused
training kernel (fwd + custom bwd) can beat the ~9 ms XLA path — the
per-cell steady-state overhead is the unknown.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from infinitevl_tpu.ops.delta_pallas import delta_rule_chunk_fused
    from infinitevl_tpu.ops.delta_rule import delta_rule_chunk
    from infinitevl_tpu.utils.benchlib import device_time_ms

    log(f"backend: {jax.default_backend()}")
    B, T, H, K, V = 1, 8192, 16, 128, 128
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(B, T, H, K) * 0.3, jnp.bfloat16)
    k = jnp.asarray(r.randn(B, T, H, K) * 0.3, jnp.bfloat16)
    v = jnp.asarray(r.randn(B, T, H, V) * 0.3, jnp.bfloat16)
    g = jnp.asarray(-np.abs(r.randn(B, T, H) * 0.05), jnp.float32)
    beta = jnp.asarray(1 / (1 + np.exp(-r.randn(B, T, H))), jnp.float32)

    for C, label in ((128, "C=128 (64 cells/head)"), (64, "C=64")):
        try:
            t0 = time.time()
            f = jax.jit(
                lambda q, k, v, g, b, C=C: delta_rule_chunk_fused(
                    q, k, v, g, b, chunk_size=C
                )
            )
            o_p, s_p = jax.block_until_ready(f(q, k, v, g, beta))
            t1 = time.time()
            ms = device_time_ms(
                lambda c, f=f: (f(c[0], c[1], c[2], g, beta)[0], c[1], c[2]),
                (q, k, v), n1=3, n2=13,
            )
            ncells = 16 * (T // C)
            log(f"fused fwd {label}: {ms:.2f} ms ({ms*1e3/ncells:.1f} "
                f"us/cell over {ncells}) [compile {t1-t0:.0f}s]")
            # parity vs XLA path
            o_x, s_x = delta_rule_chunk(q, k, v, g, beta, chunk_size=C)
            err = float(
                jnp.abs(o_p.astype(jnp.float32) - o_x.astype(jnp.float32)).max()
                / (jnp.abs(o_x.astype(jnp.float32)).max() + 1e-9)
            )
            log(f"  parity vs XLA chunk: err {err:.2e}")
        except Exception as e:  # noqa: BLE001
            log(f"fused fwd {label}: FAILED {type(e).__name__}: {str(e)[:300]}")

    # XLA reference timings at the same shapes
    for C in (128, 64):
        fx = jax.jit(
            lambda q, k, v, C=C: delta_rule_chunk(
                q, k, v, g, beta, chunk_size=C
            )[0]
        )
        ms = device_time_ms(
            lambda c, fx=fx: (fx(c[0], c[1], c[2]), c[1], c[2]),
            (q, k, v), n1=3, n2=13,
        )
        log(f"XLA chunk C={C}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
