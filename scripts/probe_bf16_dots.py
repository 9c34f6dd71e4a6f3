"""Whole-graph differentials for the native-dtype (bf16) QK^T change in
ops/vit_flash.py and ops/swa_pallas.py (round 4).

The v5e MXU runs bf16 x bf16 -> fp32 at full rate but EMULATES fp32
matmuls ~8x slower; the flash kernels upcast bf16 operands to fp32
before the score dot, paying the emulation for bit-identical products.
Expected from the FLOPs ledger (9 SWA layers, Hq=16, D=128, window 8K):
~5.6 ms of the 28.8 ms streaming frame step, ~55 ms/chunk of 32K
prefill, ~7 ms per ViT full-attention block at S=9216.

One process, median slopes (benchlib), bf16 params. Parity of the new
kernels vs the XLA dense paths is asserted on-chip first (real Mosaic
compile, not interpret).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu.config import infinitevl_3b
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.models.state import init_decoder_state
from infinitevl_tpu.utils.benchlib import device_time_ms, device_time_ms_min


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def err_ratio(x, ref):
    x = np.asarray(x, np.float64)
    ref = np.asarray(ref, np.float64)
    return float(np.abs(x - ref).mean() / (np.abs(ref).mean() + 1e-12))


def main():
    log(f"backend: {jax.default_backend()}")
    cfg = infinitevl_3b()

    # --- 1. on-chip parity: ViT flash vs chunked XLA twin (S=4096) ---
    from infinitevl_tpu.ops.vit_flash import (
        attention_segment_chunked,
        segment_flash_attention,
    )

    S, H, D = 4096, 16, 80
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (S, H, D), jnp.bfloat16)
    seg = jnp.zeros((S,), jnp.int32).at[S // 2 :].set(1)
    t0 = time.time()
    out_p = jax.block_until_ready(segment_flash_attention(q, k, v, seg))
    ref = attention_segment_chunked(q, k, v, seg)
    e = err_ratio(out_p, ref)
    log(f"vit flash parity (real compile, {time.time()-t0:.0f}s): {e:.2e}")
    assert e < 8e-3, e

    # --- 2. ViT full-attention block cost at the hires shape (S=9216) ---
    S = 9216
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (S, H, D), jnp.bfloat16)
    seg = jnp.zeros((S,), jnp.int32)

    def att_step(carry):
        (qq,) = carry
        o = segment_flash_attention(qq, k, v, seg)
        return (o * 1e-24 + qq,)

    ms = device_time_ms_min(att_step, (q,), n1=3, n2=13)
    log(f"vit full-attn S=9216 (bf16 QK^T): {ms:.2f} ms "
        f"(was ~10.5 with fp32 dots, ROUND3_NOTES)")

    # --- 3. hires ViT 1344x1344 e2e forward ---
    from infinitevl_tpu.models.vision import get_vision_plan, vision_forward

    params = init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    grid = ((1, 96, 96),)
    plan = get_vision_plan(grid, cfg.vision)
    in_feat = (
        cfg.vision.in_channels
        * cfg.vision.temporal_patch_size
        * cfg.vision.patch_size ** 2
    )
    pix = jax.random.normal(jax.random.PRNGKey(2), (9216, in_feat), jnp.bfloat16)

    vfwd = jax.jit(lambda p, x: vision_forward(p, cfg.vision, x, plan))
    t0 = time.time()
    jax.block_until_ready(vfwd(params["visual"], pix))
    log(f"  (vit compile {time.time()-t0:.0f}s)")

    def vit_step(carry):
        (x,) = carry
        o = vfwd(params["visual"], x)
        return (x + o.sum() * 1e-24,)

    ms_hr = device_time_ms(vit_step, (pix,), n1=2, n2=8)
    log(f"hires ViT 1344x1344 e2e: {ms_hr:.1f} ms (bench_r4 pre-change: 151)")

    # --- 4. streaming frame step (448px, 1024 patches -> 256+1 tokens) ---
    from infinitevl_tpu.streaming import StreamingEngine, stream_frame_step

    eng = StreamingEngine(params, cfg, frame_hw=(448, 448), dtype=jnp.bfloat16)
    n_patch = eng.grid_thw[0][1] * eng.grid_thw[0][2]
    frame = jax.random.normal(
        jax.random.PRNGKey(3), (n_patch, in_feat), jnp.bfloat16
    )
    pos_base = jnp.asarray(0, jnp.int32)
    t_off = jnp.asarray(0, jnp.int32)

    def frame_step(st):
        return stream_frame_step(
            params, cfg, frame, eng.frame_input_ids, pos_base, t_off, st,
            eng.grid_thw,
        )

    ms_f = device_time_ms_min(frame_step, eng.state, n1=5, n2=25)
    log(f"streaming frame step: {ms_f:.2f} ms = {1000/ms_f:.1f} FPS "
        f"(bench_r4 pre-change: 28.9)")

    # --- 5. one 32K-prefill chunk (T=2048 program over the ring cache) ---
    from infinitevl_tpu.generation import _prefill_text_step

    state = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
    ids = jnp.zeros((1, 2048), jnp.int32)
    pos = jnp.broadcast_to(
        jnp.arange(2048, dtype=jnp.int32)[None, None], (3, 1, 2048)
    )

    def chunk_step(st):
        _, st = _prefill_text_step(params, cfg, ids, pos, st)
        return st

    ms_c = device_time_ms_min(chunk_step, state, n1=2, n2=8)
    log(f"prefill chunk T=2048: {ms_c:.1f} ms -> 32K = {16*ms_c:.0f} ms = "
        f"{32768/(16*ms_c)*1000:.0f} tok/s (bench_r4 pre-change: 17296)")


if __name__ == "__main__":
    main()
