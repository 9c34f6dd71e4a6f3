"""hires-ViT forward attribution: where do the 151 ms go? (r4 next #6)

Differential whole-graph twins at 1344x1344 (S=9216, depth 32, 4 full-attn
layers), monkeypatching the attention callees before tracing:

  A. library forward, tuned flash default (1024x1024 after probe_vit_block)
  B. attention->identity twin: the matmul/elementwise skeleton
     (patch embed + qkv/proj/mlp + norms + rope + merger + gathers)
  C. all-window twin (full-attn layers routed to window attention):
     B + 32x window-attn cost -> isolates window vs flash attention

Ledger (bf16 matmul FLOPs): qkv+proj+mlp 11.6 TF, full-attn (Dp=128
padded) 2.8 TF, window-attn 0.14 TF, embed+merger 0.2 TF -> 75 ms floor
at 197 TF/s. A - B = attention total; B - floor(B) = skeleton
inefficiency.

Run: PYTHONPATH=/root/repo python scripts/probe_vit_attrib.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu import infinitevl_3b
from infinitevl_tpu.models import vision as V
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.utils.benchlib import device_time_ms_min

PEAK = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = infinitevl_3b()
    log(f"devices: {jax.devices()}")
    shapes = jax.eval_shape(
        lambda kk: init_params(kk, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    vp = params["visual"]
    in_feat = (cfg.vision.in_channels * cfg.vision.temporal_patch_size
               * cfg.vision.patch_size**2)
    plan = V.get_vision_plan(((1, 96, 96),), cfg.vision)
    pix = jnp.asarray(
        np.random.RandomState(3).randn(plan.seq, in_feat), jnp.bfloat16
    )

    vc = cfg.vision
    S = plan.pad_seq
    tf_proj = 2 * S * vc.hidden_size * (
        3 * vc.num_heads * vc.head_dim          # qkv
        + vc.num_heads * vc.head_dim            # proj
        + 3 * vc.intermediate_size              # gate/up/down
    ) * vc.depth
    Dp = 128
    tf_full = 4 * S * S * Dp * vc.num_heads * len(vc.fullatt_block_indexes)
    tf_win = 4 * S * plan.win_len * Dp * vc.num_heads * (
        vc.depth - len(vc.fullatt_block_indexes))
    unit = vc.spatial_merge_unit
    tf_embed = 2 * S * in_feat * vc.hidden_size
    merged = S // unit
    fc1 = unit * vc.hidden_size
    tf_merge = 2 * merged * fc1 * fc1 + 2 * merged * fc1 * vc.out_hidden_size
    tf_total = tf_proj + tf_full + tf_win + tf_embed + tf_merge
    log(f"ledger: proj {tf_proj/1e12:.2f} TF, full {tf_full/1e12:.2f}, "
        f"win {tf_win/1e12:.2f}, embed+merger {(tf_embed+tf_merge)/1e12:.2f} "
        f"-> total {tf_total/1e12:.2f} TF = {tf_total/PEAK*1e3:.1f} ms floor")

    orig_full, orig_win = V._full_attention, V._window_attention

    def run(label, full_fn, win_fn, tf):
        V._full_attention = full_fn
        V._window_attention = win_fn
        try:
            def step(px):
                out = V.vision_forward(vp, vc, px, plan)
                return px + (out[0, 0] * 1e-24).astype(px.dtype)

            f = jax.jit(step)
            t0 = time.time()
            jax.block_until_ready(f(pix))
            t1 = time.time()
            ms = device_time_ms_min(f, pix, n1=2, n2=8)
            log(f"{label}: {ms:.1f} ms, MFU(own ledger {tf/1e12:.2f} TF) "
                f"{100*tf/PEAK/(ms/1e3):.0f}% (compile {t1-t0:.0f}s)")
            return ms
        finally:
            V._full_attention = orig_full
            V._window_attention = orig_win

    # A: library default (tuned flash)
    ms_a = run("A library fwd (tuned flash)", orig_full, orig_win, tf_total)
    # B: attention -> identity
    ms_b = run(
        "B attention=identity",
        lambda q, k, v, seg, fl=None: v,
        lambda q, k, v, plan, valid: v,
        tf_proj + tf_embed + tf_merge,
    )
    # C: all layers window attention
    ms_c = run(
        "C all-window",
        lambda q, k, v, seg, fl=None, _w=orig_win: _w(q, k, v, plan,
                                                      jnp.asarray(plan.token_valid)),
        orig_win,
        tf_proj + tf_embed + tf_merge + tf_win * 32 // 28,
    )
    log(f"attention total (A-B) = {ms_a-ms_b:.1f} ms; "
        f"window 32x (C-B) = {ms_c-ms_b:.1f} ms -> per-layer "
        f"{(ms_c-ms_b)/32:.2f} ms; flash 4x = A-B - 28/32*(C-B) = "
        f"{ms_a-ms_b-(ms_c-ms_b)*28/32:.1f} ms")
    log(f"skeleton inefficiency: B {ms_b:.1f} ms vs its own floor "
        f"{(tf_proj+tf_embed+tf_merge)/PEAK*1e3:.1f} ms")


if __name__ == "__main__":
    main()
