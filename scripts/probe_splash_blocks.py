"""Sweep splash-attention block sizes at the 8K training shape.

jax's make_splash_mha defaults to 128x128 tiles (BlockSizes.get_default has
a TODO to pick better ones); at 3B dims / T=8192 the SWA stack measured
22 ms/layer vs a ~1.5 ms banded roofline. Sweep fwd and fwd+bwd.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(Bq, Bkv, T=8192, Hq=16, Hkv=2, D=128, window=8192, bwd=False):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak,
        splash_attention_mask as sam,
    )

    from infinitevl_tpu.utils.benchlib import device_time_ms

    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(1, Hq, T, D) * 0.3, jnp.bfloat16)
    k = jnp.asarray(r.randn(1, Hq, T, D) * 0.3, jnp.bfloat16)
    v = jnp.asarray(r.randn(1, Hq, T, D) * 0.3, jnp.bfloat16)
    seg = jnp.ones((1, T), jnp.int32)
    mask = sam.LocalMask((T, T), window_size=(window - 1, 0), offset=0)
    if Bq is None:
        bs = None
    else:
        bs = sak.BlockSizes(
            block_q=Bq, block_kv=Bkv, block_kv_compute=Bkv,
            block_q_dkv=Bq, block_kv_dkv=Bkv, block_kv_dkv_compute=Bkv,
            block_q_dq=Bq, block_kv_dq=Bkv,
        )
    kernel = sak.make_splash_mha(
        sam.MultiHeadMask([mask] * Hq), head_shards=1, q_seq_shards=1,
        block_sizes=bs,
    )

    if not bwd:
        f = jax.jit(
            jax.vmap(
                lambda qq, kk, vv, s: kernel(
                    qq, kk, vv, segment_ids=sak.SegmentIds(q=s, kv=s)
                )
            )
        )

        def step(c):
            qq, kk, vv = c
            o = f(qq, kk, vv, seg)
            return (o, kk, vv)

        ms = device_time_ms(step, (q, k, v), n1=3, n2=13)
    else:
        def loss(qq, kk, vv):
            o = jax.vmap(
                lambda a, b, c, s: kernel(
                    a, b, c, segment_ids=sak.SegmentIds(q=s, kv=s)
                )
            )(qq, kk, vv, seg)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        def step(c):
            qq, kk, vv = c
            dq, dk, dv = g(qq, kk, vv)
            return (dq, dk, dv)

        ms = device_time_ms(step, (q, k, v), n1=2, n2=8)
    return ms


def main():
    log(f"backend: {jax.default_backend()}")
    for bq, bkv in ((None, None), (512, 1024), (1024, 1024), (512, 2048),
                    (2048, 1024)):
        name = "default(128)" if bq is None else f"{bq}x{bkv}"
        try:
            t0 = time.time()
            ms = run(bq, bkv)
            log(f"fwd  {name}: {ms:.2f} ms [{time.time()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            log(f"fwd  {name}: FAILED {type(e).__name__}: {str(e)[:160]}")
    for bq, bkv in ((None, None), (512, 1024), (1024, 1024)):
        name = "default(128)" if bq is None else f"{bq}x{bkv}"
        try:
            t0 = time.time()
            ms = run(bq, bkv, bwd=True)
            log(f"grad {name}: {ms:.2f} ms [{time.time()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            log(f"grad {name}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
