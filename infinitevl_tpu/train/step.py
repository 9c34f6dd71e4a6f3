"""Training step: losses + optimizer plumbing.

Covers the reference's three distillation/SFT stages (train/dt/trainer.py):
- stage 1: per-layer MSE between student layers fed the teacher's layer
  inputs (LayerDistillationTrainer.compute_loss, trainer.py:137-164)
- stage 2: temperature-scaled KL on logits (trainer.py:285-308)
- stage 3 / sft: token cross-entropy with IGNORE_INDEX=-100 labels

Optimizer: AdamW with the reference's no-weight-decay rule on A_log/dt_bias
(modeling_infinitevl.py:1169,1183 `_no_weight_decay`) and on all 1-D
norm/bias params (standard HF Trainer behavior).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import InfiniteVLConfig, TextConfig
from ..models.text import embed_tokens, lm_head, text_forward
from ..parallel.sharding import _path_str

IGNORE_INDEX = -100

Params = Dict[str, Any]


def cross_entropy_loss(
    logits: jax.Array,  # [B, T, V] fp32
    labels: jax.Array,  # [B, T] with IGNORE_INDEX masking
) -> jax.Array:
    """Shifted next-token CE (labels already aligned by the collator)."""
    mask = labels != IGNORE_INDEX
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return -(tok * mask).sum() / jnp.maximum(mask.sum(), 1)


def fused_linear_cross_entropy(
    hidden: jax.Array,  # [B, T, D]
    lm_w: jax.Array,  # [D, V], or [V, D] with w_is_vd (the tied embed
    #                   table's native layout; layout-explicit so the dot
    #                   never depends on XLA fusing an embed.T — measured
    #                   equivalent for bf16, scripts/probe_decode_matrix.py)
    labels: jax.Array,  # [B, T]
    chunk: int = 1024,
    w_is_vd: bool = False,
) -> jax.Array:
    """CE without ever materializing the [T, V] logits: scan over sequence
    chunks, each checkpointed so the backward recomputes its logits.
    Counterpart of the reference's fla fused_linear_cross_entropy module
    (the [8192, 151936] fp32 logits tensor alone is 4.6 GB)."""
    B, T, D = hidden.shape
    pad = (-T) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    N = (T + pad) // chunk
    h = hidden.reshape(B, N, chunk, D).transpose(1, 0, 2, 3)
    lb = labels.reshape(B, N, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_nll(h_c, lb_c):
        if w_is_vd:
            logits = jax.lax.dot_general(
                h_c,
                lm_w.astype(h_c.dtype),
                (((h_c.ndim - 1,), (1,)), ((), ())),
            ).astype(jnp.float32)
        else:
            logits = (h_c @ lm_w.astype(h_c.dtype)).astype(jnp.float32)
        mask = lb_c != IGNORE_INDEX
        safe = jnp.where(mask, lb_c, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return -(tok * mask).sum(), mask.sum()

    def body(carry, xs):
        nll, cnt = carry
        h_c, lb_c = xs
        n, c = chunk_nll(h_c, lb_c)
        return (nll + n, cnt + c), None

    (nll, cnt), _ = jax.lax.scan(body, (jnp.float32(0), jnp.int32(0)), (h, lb))
    return nll / jnp.maximum(cnt, 1)


def kl_distill_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    temperature: float = 2.0,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """KL(teacher || student) with T^2 scaling (dt/trainer.py:285-308)."""
    t = temperature
    s = jax.nn.log_softmax(student_logits / t, axis=-1)
    p = jax.nn.softmax(teacher_logits / t, axis=-1)
    kl = (p * (jnp.log(jnp.clip(p, 1e-9)) - s)).sum(-1)
    if mask is not None:
        kl = (kl * mask).sum() / jnp.maximum(mask.sum(), 1)
    else:
        kl = kl.mean()
    return kl * (t * t)


def layerwise_mse_loss(diffs) -> jax.Array:
    """Average per-layer MSE (dt/trainer.py:137-164 semantics)."""
    losses = [jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
              for a, b in diffs]
    return sum(losses) / len(losses)


def _no_decay(path, x) -> bool:
    name = _path_str(path)
    return (
        x.ndim <= 1
        or name.endswith("A_log")
        or name.endswith("dt_bias")
        or "norm" in name.lower()
    )


def make_optimizer(
    learning_rate=1e-4,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    schedule: str = "cosine",
) -> optax.GradientTransformation:
    if callable(learning_rate):
        lr = learning_rate
    elif total_steps:
        if schedule == "cosine":
            lr = optax.warmup_cosine_decay_schedule(
                0.0, learning_rate, warmup_steps, total_steps
            )
        elif schedule == "linear":
            lr = optax.join_schedules(
                [
                    optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
                    optax.linear_schedule(learning_rate, 0.0, max(total_steps - warmup_steps, 1)),
                ],
                [warmup_steps],
            )
        else:
            lr = learning_rate
    else:
        lr = learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            lr,
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
            mask=lambda params: jax.tree_util.tree_map_with_path(
                lambda p, x: not _no_decay(p, x), params
            ),
        ),
    )
    return tx


def sft_loss_fn(
    params: Params,
    cfg: TextConfig,
    input_ids: jax.Array,  # [B, T]
    labels: jax.Array,  # [B, T]
    position_ids: jax.Array,  # [3, B, T]
    segment_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    remat: bool = False,
    remat_group: int = 1,
    remat_barrier: bool = False,
    scan_unroll: int = 1,
    remat_mode: str = "auto",
) -> jax.Array:
    embeds = inputs_embeds if inputs_embeds is not None else embed_tokens(params, input_ids)
    hidden, _, _ = text_forward(
        params, cfg, embeds, position_ids, state=None, segment_ids=segment_ids,
        remat=remat, remat_group=remat_group, remat_barrier=remat_barrier,
        scan_unroll=scan_unroll, remat_mode=remat_mode,
    )
    if remat:
        # long-context path: chunked CE avoids the [T, V] logits tensor;
        # shrink the chunk further at very long T (each fp32 logits chunk
        # is chunk x V x 4 B = 0.62 GB at 1024 — the margin that decides
        # whether the 3B 16K LoRA recipe fits one 16 GB chip)
        tied = "lm_head" not in params
        w = params["embed"] if tied else params["lm_head"]
        ce_chunk = 512 if input_ids.shape[1] >= 16384 else 1024
        return fused_linear_cross_entropy(
            hidden, w, labels, chunk=ce_chunk, w_is_vd=tied
        )
    logits = lm_head(params, cfg, hidden)
    return cross_entropy_loss(logits, labels)


def mm_sft_loss_fn(
    params: Params,  # full pytree: {"text": ..., "visual": ...}
    cfg: InfiniteVLConfig,
    input_ids: jax.Array,  # [B, T]
    labels: jax.Array,  # [B, T]
    position_ids: jax.Array,  # [3, B, T] vision-aware mrope indices
    pixel_values: Optional[jax.Array] = None,  # [n_patches, in_feat] packed
    grid_thw: Optional[tuple] = None,  # static tuple of (t, h, w)
    pixel_values_videos: Optional[jax.Array] = None,
    video_grid_thw: Optional[tuple] = None,
    segment_ids: Optional[jax.Array] = None,
    remat: bool = False,
    remat_group: int = 1,
    remat_barrier: bool = False,
    scan_unroll: int = 1,
    remat_mode: str = "auto",
) -> jax.Array:
    """Multimodal SFT loss: ViT features scattered into the token embeds
    (the reference trains the full VLM on image batches — collator emits
    pixel_values/image_grid_thw, data/collator.py:124-196)."""
    from ..models.infinitevl import encode_vision, scatter_vision_embeds

    tp = params["text"]
    embeds = embed_tokens(tp, input_ids)
    if pixel_values is not None:
        vis = encode_vision(params, cfg, pixel_values, grid_thw)
        embeds = scatter_vision_embeds(
            embeds, vis, input_ids == cfg.image_token_id
        )
    if pixel_values_videos is not None:
        vis = encode_vision(params, cfg, pixel_values_videos, video_grid_thw)
        embeds = scatter_vision_embeds(
            embeds, vis, input_ids == cfg.video_token_id
        )
    hidden, _, _ = text_forward(
        tp, cfg.text, embeds, position_ids, state=None, segment_ids=segment_ids,
        remat=remat, remat_group=remat_group, remat_barrier=remat_barrier,
        scan_unroll=scan_unroll, remat_mode=remat_mode,
    )
    if remat:
        tied = "lm_head" not in tp
        w = tp["embed"] if tied else tp["lm_head"]
        ce_chunk = 512 if input_ids.shape[1] >= 16384 else 1024
        return fused_linear_cross_entropy(
            hidden, w, labels, chunk=ce_chunk, w_is_vd=tied
        )
    logits = lm_head(tp, cfg.text, hidden)
    return cross_entropy_loss(logits, labels)


def make_mm_sft_train_step(
    cfg: InfiniteVLConfig, tx: optax.GradientTransformation, remat: bool = False,
    remat_group: int = 1, remat_barrier: bool = False, scan_unroll: int = 1,
    remat_mode: str = "auto",
):
    """Multimodal train step. Returns (params, opt_state, batch, grid_thw,
    video_grid_thw) -> (params, opt_state, loss); jit with static_argnums for
    the grids — one compile per distinct grid signature (training configs
    bucket images to a fixed resolution so this stays O(1))."""

    def step(params, opt_state, batch, grid_thw=None, video_grid_thw=None):
        def loss_fn(p):
            return mm_sft_loss_fn(
                p,
                cfg,
                batch["input_ids"],
                batch["labels"],
                batch["position_ids"],
                pixel_values=batch.get("pixel_values"),
                grid_thw=grid_thw,
                pixel_values_videos=batch.get("pixel_values_videos"),
                video_grid_thw=video_grid_thw,
                segment_ids=batch.get("segment_ids"),
                remat=remat,
                remat_group=remat_group,
                remat_barrier=remat_barrier,
                scan_unroll=scan_unroll, remat_mode=remat_mode,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sft_eval_fn(cfg: TextConfig):
    """Loss-only twin of make_sft_train_step for the val_size split
    (reference Seq2SeqTrainer.evaluate role): jittable
    (params, batch) -> scalar mean CE over supervised tokens. No remat —
    eval holds no backward residuals."""

    def eval_loss(params, batch):
        return sft_loss_fn(
            params["text"] if "text" in params else params,
            cfg,
            batch["input_ids"],
            batch["labels"],
            batch["position_ids"],
            batch.get("segment_ids"),
        )

    return eval_loss


def make_sft_train_step(
    cfg: TextConfig, tx: optax.GradientTransformation, remat: bool = False,
    remat_group: int = 1, remat_barrier: bool = False, scan_unroll: int = 1,
    remat_mode: str = "auto",
):
    """Returns jittable (params, opt_state, batch) -> (params, opt_state, loss).
    params: full pytree with a "text" subtree (so sharding-rule paths match);
    batch: dict(input_ids, labels, position_ids[, segment_ids]).
    remat=True enables per-layer gradient checkpointing for long contexts."""

    def step(params, opt_state, batch):
        def loss_fn(p):
            return sft_loss_fn(
                p["text"] if "text" in p else p,
                cfg,
                batch["input_ids"],
                batch["labels"],
                batch["position_ids"],
                batch.get("segment_ids"),
                remat=remat,
                remat_group=remat_group,
                remat_barrier=remat_barrier,
                scan_unroll=scan_unroll, remat_mode=remat_mode,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
