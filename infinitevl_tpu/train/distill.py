"""Distillation-training ("dt") stages.

Functional re-design of the reference's distillation trainers
(src/llamafactory/train/dt/trainer.py):

- Stage 1 (LayerDistillationTrainer, trainer.py:137-164): the teacher runs
  once collecting every decoder layer's input/output; each student layer is
  fed the TEACHER's layer input and regressed (MSE * mse_factor) onto the
  teacher's layer output. In JAX there are no hooks — text_forward already
  returns per-layer hidden states, and student layers are plain functions.
- Stage 2 (EndtoEndDistillationTrainer, trainer.py:285-308): KL between
  student and teacher logits with temperature^2 scaling.
- Stage 3 (CustomSeq2SeqTrainer, trainer.py:390-503): plain CE SFT (see
  train/step.py), typically with LoRA at 32K context.

Both models share embeddings/rope, so position embeddings are computed once.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..config import TextConfig
from ..models.text import (
    decoder_layer_forward,
    embed_tokens,
    lm_head,
    text_forward,
)
from ..ops.rope import mrope_cos_sin
from .step import cross_entropy_loss, kl_distill_loss

Params = Dict[str, Any]


def teacher_layer_io(
    teacher_params: Params,
    teacher_cfg: TextConfig,
    inputs_embeds: jax.Array,
    position_ids: jax.Array,
    segment_ids: Optional[jax.Array] = None,
):
    """Run the teacher once, returning the list of per-layer inputs
    (hidden_states[i] is layer i's input; [i+1] its output before the final
    norm... note the last entry is post-final-norm, so use [: n_layers+1]
    boundaries accordingly). Replaces TeacherInputCapture's forward hooks
    (dt/trainer.py:48-96)."""
    _, _, hidden = text_forward(
        teacher_params,
        teacher_cfg,
        inputs_embeds,
        position_ids,
        state=None,
        segment_ids=segment_ids,
        output_hidden_states=True,
    )
    return hidden


def stage1_loss(
    student_params: Params,
    student_cfg: TextConfig,
    teacher_hidden: Sequence[jax.Array],
    position_ids: jax.Array,
    mse_factor: float = 1000.0,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-layer MSE: student layer i (fed the teacher's input i) vs the
    teacher's output i."""
    cos, sin = mrope_cos_sin(
        position_ids,
        student_params["inv_freq"],
        student_cfg.mrope_section,
        student_cfg.attention_scaling,
        dtype=teacher_hidden[0].dtype,
    )
    n = len(student_params["layers"])
    total = 0.0
    for i, lp in enumerate(student_params["layers"]):
        role = student_cfg.layer_role(i)
        out, _ = decoder_layer_forward(
            lp, student_cfg, role, teacher_hidden[i], cos, sin, None, segment_ids
        )
        diff = out.astype(jnp.float32) - teacher_hidden[i + 1].astype(jnp.float32)
        total = total + jnp.mean(diff**2)
    return total / n * mse_factor


def _mm_embeds(
    text_params: Params,
    full_params: Params,  # tree holding "visual" (teacher's, shared + frozen)
    full_cfg,  # InfiniteVLConfig
    batch: Dict[str, Any],
    grid_thw,
    video_grid_thw,
) -> jax.Array:
    """Token embeds with vision features scattered in. The ViT is shared
    between teacher and student and frozen during dt stages (the reference
    distills from Qwen2.5-VL with distill_weights=self_attn — only text
    mixers train), so features are computed ONCE under stop_gradient."""
    from ..models.infinitevl import encode_vision, scatter_vision_embeds

    embeds = embed_tokens(text_params, batch["input_ids"])
    if batch.get("pixel_values") is not None:
        vis = encode_vision(full_params, full_cfg, batch["pixel_values"], grid_thw)
        embeds = scatter_vision_embeds(
            embeds, jax.lax.stop_gradient(vis),
            batch["input_ids"] == full_cfg.image_token_id,
        )
    if batch.get("pixel_values_videos") is not None:
        vis = encode_vision(
            full_params, full_cfg, batch["pixel_values_videos"], video_grid_thw
        )
        embeds = scatter_vision_embeds(
            embeds, jax.lax.stop_gradient(vis),
            batch["input_ids"] == full_cfg.video_token_id,
        )
    return embeds


def make_stage1_step(
    student_cfg: TextConfig,
    teacher_cfg: TextConfig,
    tx: optax.GradientTransformation,
    mse_factor: float = 1000.0,
    full_cfg=None,  # InfiniteVLConfig => multimodal batches supported
):
    """(student, opt_state, teacher, batch[, grid_thw, video_grid_thw]) ->
    (student, opt_state, loss). batch: input_ids [B,T], position_ids [3,B,T]
    [, segment_ids, pixel_values, pixel_values_videos]. With full_cfg, the
    teacher may be a full {"text", "visual"} tree and vision features are
    scattered into the shared embeds (the reference distills a VLM on image
    data, examples/train_linear/*.yaml)."""

    def step(student_params, opt_state, teacher_params, batch,
             grid_thw=None, video_grid_thw=None):
        t_text = (
            teacher_params["text"] if "text" in teacher_params else teacher_params
        )
        if batch.get("inputs_embeds") is not None:
            embeds = batch["inputs_embeds"]
        elif full_cfg is not None:
            embeds = _mm_embeds(
                t_text, teacher_params, full_cfg, batch, grid_thw, video_grid_thw
            )
        else:
            embeds = embed_tokens(t_text, batch["input_ids"])
        hidden = teacher_layer_io(
            t_text, teacher_cfg, embeds, batch["position_ids"],
            batch.get("segment_ids"),
        )

        def loss_fn(sp):
            return stage1_loss(
                sp, student_cfg, hidden, batch["position_ids"], mse_factor,
                batch.get("segment_ids"),
            )

        loss, grads = jax.value_and_grad(loss_fn)(student_params)
        updates, opt_state = tx.update(grads, opt_state, student_params)
        student_params = optax.apply_updates(student_params, updates)
        return student_params, opt_state, loss

    return step


def make_stage2_step(
    student_cfg: TextConfig,
    teacher_cfg: TextConfig,
    tx: optax.GradientTransformation,
    temperature: float = 2.0,
    full_cfg=None,  # InfiniteVLConfig => multimodal batches supported
):
    """End-to-end logit KL distillation step. With full_cfg, vision features
    from the shared frozen ViT are scattered into both the teacher's and the
    student's embeds."""

    def step(student_params, opt_state, teacher_params, batch,
             grid_thw=None, video_grid_thw=None):
        pos = batch["position_ids"]
        seg = batch.get("segment_ids")
        t_text = (
            teacher_params["text"] if "text" in teacher_params else teacher_params
        )
        if full_cfg is not None:
            t_embeds = _mm_embeds(
                t_text, teacher_params, full_cfg, batch, grid_thw, video_grid_thw
            )
        else:
            t_embeds = embed_tokens(t_text, batch["input_ids"])
        t_hidden, _, _ = text_forward(
            t_text, teacher_cfg, t_embeds, pos, None, seg
        )
        t_logits = lm_head(t_text, teacher_cfg, t_hidden)
        mask = None
        if batch.get("labels") is not None:
            mask = (batch["labels"] != -100).astype(jnp.float32)

        def loss_fn(sp):
            if full_cfg is not None:
                # student embed table trains; vision features stay shared +
                # frozen (stop_gradient inside _mm_embeds)
                s_embeds = _mm_embeds(
                    sp, teacher_params, full_cfg, batch, grid_thw, video_grid_thw
                )
            else:
                s_embeds = embed_tokens(sp, batch["input_ids"])
            s_hidden, _, _ = text_forward(sp, student_cfg, s_embeds, pos, None, seg)
            s_logits = lm_head(sp, student_cfg, s_hidden)
            loss = kl_distill_loss(s_logits, t_logits, temperature, mask)
            if batch.get("labels") is not None:
                loss = loss + cross_entropy_loss(s_logits, batch["labels"])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(student_params)
        updates, opt_state = tx.update(grads, opt_state, student_params)
        student_params = optax.apply_updates(student_params, updates)
        return student_params, opt_state, loss

    return step


def apply_trainable_mask(tx: optax.GradientTransformation, mask: Params):
    """Freeze params where mask is False (adapter.py:249-269 equivalent)."""
    return optax.chain(
        tx,
        optax.masked(
            optax.set_to_zero(),
            jax.tree.map(lambda m: not m, mask),
        ),
    )
