"""hires-ViT prefill attribution + flash block-size tuning (r4 next #6).

156 ms for one 1344x1344 image (S=9216 patches) is ~39% MFU on the ~14
TFLOP forward (12.3 TF projections + 1.7 TF full-attn). Hypothesis: the
flash kernel's default 512x512 blocks launch a (16, 18, 18) = 5184-program
grid whose per-block Mosaic overhead dominates (r3 measured 10.46 ms per
full-attn block vs the 2.2 ms FLOPs floor). Bigger blocks cut the grid
quadratically; VMEM bounds: fp32 score tile block_q x block_k x 4 <= ~9 MB
(scoped stack 16 MB), so 1024x1024 (4 MB) fits and 1536x1536 (9.4 MB)
is the edge.

Measures, chained, on the real chip:
  1. segment_flash_attention alone at S=9216 across block configs
  2. the full hires vision_forward at the best config vs the default
Run: python scripts/probe_vit_block.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu import infinitevl_3b
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.models.vision import get_vision_plan, vision_forward
from infinitevl_tpu.ops.vit_flash import segment_flash_attention
from infinitevl_tpu.utils.benchlib import device_time_ms_min


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = infinitevl_3b()
    log(f"devices: {jax.devices()}")
    S, H, D = 9216, cfg.vision.num_heads, cfg.vision.hidden_size // cfg.vision.num_heads
    log(f"flash shape: S={S} H={H} D={D}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = (jax.random.normal(ks[0], (S, H, D)) * 0.3).astype(jnp.bfloat16)
    k = (jax.random.normal(ks[1], (S, H, D)) * 0.3).astype(jnp.bfloat16)
    v = (jax.random.normal(ks[2], (S, H, D)) * 0.3).astype(jnp.bfloat16)
    seg = jnp.zeros((S,), jnp.int32)

    # FLOPs floor for one call: QK^T + PV = 4*S^2*D*H (Dp=128 padded)
    fl = 4 * S * S * 128 * H
    log(f"one flash call = {fl/1e12:.2f} TF -> {fl/197e12*1e3:.2f} ms floor")

    ref = None
    for bq, bk in ((512, 512), (1024, 512), (1024, 1024), (512, 1024),
                   (1536, 1536), (2048, 1024)):
        score_mb = bq * bk * 4 / 1e6
        try:
            t0 = time.time()

            def step(x, _bq=bq, _bk=bk):
                o = segment_flash_attention(
                    x, k, v, seg, block_q=_bq, block_k=_bk
                )
                return x + (o[0, 0, 0] * 1e-24).astype(x.dtype)

            jax.block_until_ready(step(q))
            t1 = time.time()
            ms = device_time_ms_min(step, q, n1=2, n2=8, reps=3)
            out = segment_flash_attention(q, k, v, seg, block_q=bq, block_k=bk)
            if ref is None:
                ref = out.astype(jnp.float32)
                err = 0.0
            else:
                err = float(jnp.abs(out.astype(jnp.float32) - ref).max()
                            / (jnp.abs(ref).max() + 1e-9))
            log(f"block {bq}x{bk} (score tile {score_mb:.0f} MB): "
                f"{ms:.2f} ms/call, grid {(H, S//bq if S%bq==0 else -(-S//bq), S//bk if S%bk==0 else -(-S//bk))}, "
                f"err-vs-512 {err:.1e} (compile {t1-t0:.0f}s)")
        except Exception as e:  # noqa: BLE001 - VMEM/compile failures expected
            log(f"block {bq}x{bk}: failed {type(e).__name__}: {str(e)[:160]}")

    # full hires forward at the library default (whatever vit_flash ships)
    shapes = jax.eval_shape(
        lambda kk: init_params(kk, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    in_feat = (cfg.vision.in_channels * cfg.vision.temporal_patch_size
               * cfg.vision.patch_size**2)
    plan_hr = get_vision_plan(((1, 96, 96),), cfg.vision)
    pix = jnp.asarray(
        np.random.RandomState(3).randn(plan_hr.seq, in_feat), jnp.bfloat16
    )
    vp = params["visual"]

    def vit_step(px):
        out = vision_forward(vp, cfg.vision, px, plan_hr)
        return px + (out[0, 0] * 1e-24).astype(px.dtype)

    t0 = time.time()
    f = jax.jit(vit_step)
    jax.block_until_ready(f(pix))
    t1 = time.time()
    ms = device_time_ms_min(f, pix, n1=2, n2=8)
    log(f"hires vision_forward (library default blocks): {ms:.1f} ms "
        f"(compile {t1-t0:.0f}s)")


if __name__ == "__main__":
    main()
