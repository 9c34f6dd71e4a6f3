"""Qwen2.5-VL-style dynamic-resolution ViT encoder, TPU-native.

Re-design of the reference vision stack (modeling_infinitevl.py:461-869):
all data-dependent layout work — window reordering, cu_seqlens, rotary
position tables — is computed host-side per (t, h, w) grid bucket and baked
into the jitted graph as constants (`VisionPlan`), which is exactly the
layout the reference's streaming variant reaches for with its
"graph-bucket" precomputation (infinitevl_streaming/modeling_infinitevl.py:880-964);
XLA static shapes make it the only layout.

Attention strategy per block:
- Window blocks (most of the 32): after the window permutation, every
  window is a contiguous run of `spatial_merge_unit * merger_window^2`
  tokens padded to equal size, so window attention is a *batched* dense
  attention over [num_windows, win_len] — no masks, MXU-shaped.
- Full-attention blocks (fullatt_block_indexes): segment-masked dense
  attention over the packed sequence (one segment per image/video frame).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisionConfig
from ..ops.norms import rms_norm, silu
from ..ops.rope import apply_rotary_vision, vision_cos_sin, vision_rot_pos_ids
from ..ops.swa import attention_dense

Params = Dict[str, Any]

# Packed-sequence length at which full-attention blocks switch from the
# dense-mask path to the segment-aware flash kernel (ops/vit_flash.py).
# Streaming frames (S=1024+pads at 448x448) stay dense: measured faster at
# that size and Mosaic compiles through the relay cost 30-250 s each.
FLASH_FULL_ATTN_MIN_SEQ = 4096
# window layers switch to the diagonal flash kernel from this packed length
# AND window length (see _window_attention: at the deployed L=64 the
# batched-dense path WINS — measured in-model at 1344x1344: dense 136.3 ms
# total vs kernel 160.8/164.7/165.4 at block 512/1024/256, because dense
# scores are only [144,16,64,64]=38 MB while the kernel pays D-pad 80->128,
# [H,S,Dp] transposes, and >=8x wasted score columns; standalone layer:
# dense 0.58 ms vs kernel-b512 0.89). From L=256 the dense score tensor is
# 151 MB/layer and the kernel's waste is <=4x — the crossover regime.
# block override for probes (None = kernel default)
WINDOW_FLASH_MIN_SEQ = 4096
WINDOW_FLASH_MIN_WIN_LEN = 256
WINDOW_FLASH_BLOCK: "int | None" = None


class VisionPlan:
    """Static per-grid layout: permutations, window shapes, rope tables.

    Built once per distinct grid_thw tuple (host numpy) and cached; every
    array here enters the jitted forward as a constant."""

    def __init__(self, grid_thw: Tuple[Tuple[int, int, int], ...], cfg: VisionConfig):
        self.grid_thw = grid_thw
        self.cfg = cfg
        m = cfg.spatial_merge_size
        unit = cfg.spatial_merge_unit
        mw = cfg.merger_window  # window edge in merged tokens

        # --- window permutation in merged-token units, with pad slots ---
        perm_chunks = []  # merged-token index or -1 (pad), window-major order
        win_lens_merged = []  # real merged tokens per window
        # Full-attention segment per *temporal frame* (the reference builds
        # full cu_seqlens via repeat_interleave(h*w, t), modeling:842-850).
        seg_full_merged = []
        seg_id = 0
        base = 0
        for img_id, (t, h, w) in enumerate(grid_thw):
            lh, lw = h // m, w // m
            for _ in range(t):
                seg_full_merged.extend([seg_id] * (lh * lw))
                seg_id += 1
            nh = -(-lh // mw)
            nw = -(-lw // mw)
            idx = np.arange(t * lh * lw).reshape(t, lh, lw)
            padded = np.full((t, nh * mw, nw * mw), -1, dtype=np.int64)
            padded[:, :lh, :lw] = idx
            padded = (
                padded.reshape(t, nh, mw, nw, mw)
                .transpose(0, 1, 3, 2, 4)
                .reshape(t * nh * nw, mw * mw)
            )
            for row in padded:
                real = row[row >= 0]
                perm_chunks.append(np.where(row >= 0, row + base, -1))
                win_lens_merged.append(len(real))
            base += t * lh * lw

        win = np.stack(perm_chunks)  # [nW, mw*mw] merged indices or -1
        self.num_windows = win.shape[0]
        self.win_len_merged = win.shape[1]  # mw*mw
        self.win_len = self.win_len_merged * unit  # patch tokens per window
        self.seq_merged = base  # real merged tokens
        self.seq = base * unit  # real patch tokens
        self.pad_seq_merged = self.num_windows * self.win_len_merged
        self.pad_seq = self.pad_seq_merged * unit

        # gather index over merged units; pads read unit 0 and are masked
        flat = win.reshape(-1)
        self.merged_gather = np.where(flat >= 0, flat, 0).astype(np.int32)
        self.merged_valid = (flat >= 0).astype(bool)  # [pad_seq_merged]
        self.token_valid = np.repeat(self.merged_valid, unit)  # [pad_seq]

        # inverse permutation: merged output slot for each original merged idx
        inv = np.zeros(self.seq_merged, dtype=np.int32)
        inv[flat[flat >= 0]] = np.nonzero(flat >= 0)[0].astype(np.int32)
        self.merged_inverse = inv  # [seq_merged] index into padded window order

        # window-attention segment ids in window order: real tokens of
        # window w carry id w, pad slots -2-w (same partition as the
        # valid==valid mask: reals attend reals, pads attend pads, never
        # across windows) — lets the diagonal flash kernel
        # (ops/vit_flash.window_flash_attention) express window attention
        # as a segment compare
        wi = np.repeat(
            np.arange(self.num_windows, dtype=np.int32), self.win_len
        )
        self.win_seg = np.where(self.token_valid, wi, -2 - wi)  # [pad_seq]

        # full-attention segment ids in *window order*, padded slots get -1
        seg_full = np.asarray(seg_full_merged, dtype=np.int32)
        seg_win_order = np.where(
            self.merged_valid, seg_full[self.merged_gather], -1
        )
        self.seg_full = np.repeat(seg_win_order, unit)  # [pad_seq]

        # rotary tables in window order (patch-token units); kept as numpy so
        # plans can be built inside a jit trace (arrays become constants)
        # equal-grid batched full-attention fast path: when every grid is
        # identical (multi-stream / clip ingestion), each grid's
        # window-ordered span has the same padded length, so the
        # full-attention blocks can batch per grid instead of running one
        # segment-masked dense over the whole packed sequence (O((B*S)^2))
        self.equal_frame_len = (
            self.pad_seq // len(grid_thw)
            if len(grid_thw) > 1 and len(set(grid_thw)) == 1
            else None
        )

        pos_ids = vision_rot_pos_ids(grid_thw, m)  # [seq, 2] original order
        cos, sin = vision_cos_sin(pos_ids, cfg.head_dim)
        cos = cos.reshape(self.seq_merged, unit, -1)
        sin = sin.reshape(self.seq_merged, unit, -1)
        self.cos = cos[self.merged_gather].reshape(self.pad_seq, -1)
        self.sin = sin[self.merged_gather].reshape(self.pad_seq, -1)


@functools.lru_cache(maxsize=64)
def get_vision_plan(
    grid_thw: Tuple[Tuple[int, int, int], ...], cfg: VisionConfig
) -> VisionPlan:
    return VisionPlan(grid_thw, cfg)


def _dense(x, p):
    if "kernel_q" in p:  # weight-only int8 (models/quant.py)
        y = (x @ p["kernel_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
    elif "kernel_q4f" in p:  # fused Pallas int4 (ops/int4_pallas.py)
        from ..ops.int4_pallas import int4_matmul_fused

        y = int4_matmul_fused(x, p)
    elif "kernel_q4" in p or "kernel_q4b" in p:  # int4 packed (models/quant.py)
        from .quant import int4_matmul

        y = int4_matmul(x, p)
    else:
        y = x @ p["kernel"]
    if "lora_a" in p:  # low-rank side path (train/lora.attach_lora)
        y = y + ((x @ p["lora_a"]) @ p["lora_b"]).astype(y.dtype)
    if "dora_scale" in p:  # DoRA magnitude rescale, pre-bias
        y = y * p["dora_scale"].astype(y.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _vision_mlp(p: Params, x: jax.Array) -> jax.Array:
    if "gate_up" in p:  # fused layout (models/fuse.py)
        gu = _dense(x, p["gate_up"])
        inter = gu.shape[-1] // 2
        return _dense(silu(gu[..., :inter]) * gu[..., inter:], p["down"])
    return _dense(silu(_dense(x, p["gate"])) * _dense(x, p["up"]), p["down"])


def _window_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, plan: VisionPlan, valid: jax.Array
) -> jax.Array:
    """Batched per-window dense attention. q/k/v: [S, H, D] in window order.

    Long packed sequences with LARGE windows route through the diagonal
    Pallas flash kernel (ops/vit_flash.window_flash_attention), which
    keeps score tiles in VMEM. At the deployed InfiniteVL window length
    (L=64) the XLA batched path is FASTER and stays the default — its
    [nW, H, 64, 64] fp32 scores are only 38 MB at 1344x1344 and XLA
    fuses mask+softmax well, while the kernel pays head-dim padding
    (80->128), layout transposes, and wasted score columns (measured
    in-model: 136.3 ms full forward dense vs 160.8 best-kernel; see
    WINDOW_FLASH_* constants above and ROUND5_NOTES #6). Same numerics
    either way (fp32 softmax), tested in tests/test_pallas_kernels.py."""
    S, H, D = q.shape
    nW, L = plan.num_windows, plan.win_len
    if (
        S >= WINDOW_FLASH_MIN_SEQ
        and L % 8 == 0
        and WINDOW_FLASH_MIN_WIN_LEN <= L <= 1536
    ):
        from ..ops.vit_flash import vit_window_attention

        return vit_window_attention(
            q, k, v, jnp.asarray(plan.win_seg), L, block=WINDOW_FLASH_BLOCK
        )
    qw = q.reshape(nW, L, H, D)
    kw = k.reshape(nW, L, H, D)
    vw = v.reshape(nW, L, H, D)
    # real queries see real keys; pad queries see pad keys (keeps pad rows
    # finite so NaNs can never leak through later masked softmaxes)
    vm = valid.reshape(nW, L)
    mask = vm[:, :, None] == vm[:, None, :]
    out = attention_dense(qw, kw, vw, mask)
    return out.reshape(S, H, D)


def _full_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seg: jax.Array,
    frame_len: Optional[int] = None,
) -> jax.Array:
    """Segment-masked non-causal attention over the packed sequence.

    Pad slots all share segment -1, so they attend each other and stay
    finite without ever mixing with real tokens. With `frame_len` set
    (equal grids), the packed sequence reshapes to [n_frames, frame_len]
    blocks and attention batches per frame — identical semantics (segments
    never cross grid spans) at 1/n_frames of the mask/score work."""
    if frame_len is not None:
        S, H, D = q.shape
        n = S // frame_len
        segb = seg.reshape(n, frame_len)
        mask = segb[:, :, None] == segb[:, None, :]
        out = attention_dense(
            q.reshape(n, frame_len, H, D),
            k.reshape(n, frame_len, H, D),
            v.reshape(n, frame_len, H, D),
            mask,
        )
        return out.reshape(S, H, D)
    if q.shape[0] >= FLASH_FULL_ATTN_MIN_SEQ:
        # long packed sequence (high-res image / multi-image prefill): the
        # dense path's [H, S, S] scores are 5.4 GB fp32 at 1344x1344 —
        # stream KV through the flash kernel instead (chunked XLA twin off
        # TPU / in the backward)
        from ..ops.vit_flash import vit_full_attention

        return vit_full_attention(q, k, v, seg)
    mask = seg[:, None] == seg[None, :]
    out = attention_dense(q[None], k[None], v[None], mask[None])
    return out[0]


def vision_block_forward(
    p: Params,
    cfg: VisionConfig,
    x: jax.Array,  # [S, Dv] window order
    plan: VisionPlan,
    full: bool,
    valid: jax.Array,
    seg_full: jax.Array,
) -> jax.Array:
    S = x.shape[0]
    H = cfg.num_heads
    D = cfg.head_dim
    h = rms_norm(x, p["norm1"], 1e-6)
    qkv = _dense(h, p["qkv"]).reshape(S, 3, H, D)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q, k = apply_rotary_vision(
        q, k, jnp.asarray(plan.cos), jnp.asarray(plan.sin)
    )
    if full:
        attn = _full_attention(q, k, v, seg_full, plan.equal_frame_len)
    else:
        attn = _window_attention(q, k, v, plan, valid)
    x = x + _dense(attn.reshape(S, H * D), p["proj"])
    x = x + _vision_mlp(p["mlp"], rms_norm(x, p["norm2"], 1e-6))
    return x


def vision_forward(
    params: Params,
    cfg: VisionConfig,
    pixel_values: jax.Array,  # [seq, in_feat] flattened patches (processor layout)
    plan: VisionPlan,
) -> jax.Array:
    """Full ViT: patch embed -> window reorder -> blocks -> merger -> restore.

    Returns [seq_merged, out_hidden] in the original token order."""
    unit = cfg.spatial_merge_unit
    x = pixel_values.astype(params["patch_embed"].dtype) @ params["patch_embed"]
    # reorder to window order with pad slots
    x = x.reshape(plan.seq_merged, unit, -1)
    gather = jnp.asarray(plan.merged_gather)
    x = x[gather].reshape(plan.pad_seq, -1)
    valid = jnp.asarray(plan.token_valid)
    seg_full = jnp.asarray(plan.seg_full)

    fullatt = set(cfg.fullatt_block_indexes)
    for i, bp in enumerate(params["blocks"]):
        x = vision_block_forward(bp, cfg, x, plan, i in fullatt, valid, seg_full)

    # merger: RMSNorm -> concat 2x2 merged unit -> MLP (GELU)
    m = params["merger"]
    h = rms_norm(x, m["ln_q"], 1e-6)
    h = h.reshape(plan.pad_seq_merged, unit * h.shape[-1])
    h = _dense(h, m["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    h = _dense(h, m["fc2"])  # [pad_seq_merged, out]

    # restore original merged-token order, dropping pad slots
    inv = jnp.asarray(plan.merged_inverse)
    return h[inv]
