"""Sequence-axis pipeline microbatching (TeraPipe-style) for training.

The batch-axis GPipe/1F1B schedules (parallel/pipeline.py) need B >=
n_microbatches, which leaves pipeline parallelism useless for exactly the
recipes it would help most here: B=1 long-context SFT. This module
microbatches along the SEQUENCE instead — the TeraPipe idea (Li et al.,
2021), which the hybrid InfiniteVL trunk is unusually suited to:

- every layer role in the deployed config is local-or-recurrent
  (sliding-window attention / gated DeltaNet), so the cross-chunk
  dependency is a small per-layer carry (the previous window's post-RoPE
  K/V, or the fp32 delta state + conv tails) — NOT a growing KV cache;
- the training layer code already evaluates in sequence chunks with those
  carries threaded through an in-layer scan
  (models/text.swa_forward_seq_chunked / delta_forward_seq_chunked);
  here the same carries become explicit *pipeline state*
  (models/text.decoder_layer_chunk_forward).

Schedule: identical wavefront to pipeline.pipeline_decoder_forward —
chunk c enters stage 0 at tick c; stage s runs chunk c = t - s at tick t;
jnp.roll on the stage axis hands activations to stage s+1 (GSPMD lowers
it to a collective-permute on ICI). The one addition is the per-stage
carry pytree in the scan state, advanced ONLY on ticks where the stage
holds a real chunk (bubble ticks keep the old carry, so warm-up/drain
garbage can never corrupt the recurrent state). Chunks flow left-to-right
in order by construction, which is exactly what the carries require.
Bubble fraction (S-1)/(M+S-1) with M = T / chunk_t — independent of B.

`jax.grad` through the tick scan IS the backward schedule: activation
gradients flow via the roll reverses (reverse permutes) and state
gradients flow chunk c+1 -> c through the carry, interleaved on the same
reverse wavefront.

Constraints: chunk length Tc = T / M must be a multiple of the sliding
window (the SWA carry contract — 8192 deployed, so 32K trains at M <= 4,
64K at M <= 8) and the stage cut follows pipeline.stack_stage_params
(stages at hybrid-period granularity). Reference: the reference only
declares pipeline stages (configuration_infinitevl.py:202-206) and has no
sequence-axis schedule at all.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TextConfig
from ..models.text import decoder_layer_chunk_forward, init_layer_seq_carry
from .pipeline import PIPE, stack_stage_params, unstack_stage_params  # noqa: F401  (re-export for callers)
from .sharding import DATA

Params = Dict[str, Any]


def init_stage_carries(
    stage_stacks: Sequence[Any],
    cfg: TextConfig,
    B: int,
    dtype,
) -> Tuple:
    """Zero carries for every layer in every stage: a tuple over the
    period positions, each a pytree with leading [S, local] axes matching
    the stage_stacks layout (so the stage vmap and the local-period scan
    slice both carries and weights identically)."""
    period = len(stage_stacks)
    pattern = tuple(cfg.layer_role(j) for j in range(period))
    carries = []
    for j in range(period):
        lead = jax.tree.leaves(stage_stacks[j])[0].shape
        S, local = lead[0], lead[1]
        # shapes only — never touch the weight data
        proto = jax.eval_shape(
            lambda t: jax.tree.map(lambda l: l[0, 0], t), stage_stacks[j]
        )
        c0 = init_layer_seq_carry(proto, cfg, pattern[j], B, dtype)
        carries.append(
            jax.tree.map(
                lambda leaf: jnp.broadcast_to(
                    leaf, (S, local) + leaf.shape
                ).astype(leaf.dtype),
                c0,
            )
        )
    return tuple(carries)


def _stage_chunk_fn(
    stacks_s: Sequence[Any],  # per-period trees, leaves [local, ...]
    carries_s: Sequence[Any],  # per-period carry trees, leaves [local, ...]
    cfg: TextConfig,
    pattern: Tuple[str, ...],
    x: jax.Array,  # [B, Tc, D]
    cos: jax.Array,
    sin: jax.Array,
    segment_ids: Optional[jax.Array],
    remat: bool,
) -> Tuple[jax.Array, Tuple]:
    """One stage over one chunk: scan its local periods, threading each
    layer's cross-chunk carry in and out. Layer-level checkpointing
    (remat_mode="layer", the measured-fastest placement at chunk-sized
    B*T — see models/text.text_forward)."""

    def body(x, inp):
        slices, carrs = inp
        new_carrs = []
        for j, role in enumerate(pattern):
            def layer_fn(lp, x, c, _role=role):
                return decoder_layer_chunk_forward(
                    lp, cfg, _role, x, cos, sin, segment_ids, c
                )

            if remat:
                layer_fn = jax.checkpoint(layer_fn)
            x, c2 = layer_fn(slices[j], x, carrs[j])
            new_carrs.append(c2)
        return x, tuple(new_carrs)

    x, carries_out = jax.lax.scan(
        body, x, (tuple(stacks_s), tuple(carries_s))
    )
    return x, carries_out


def seq_pipeline_decoder_forward(
    stage_stacks: Sequence[Any],  # per-period trees, leaves [S, local, ...]
    cfg: TextConfig,
    x_mb: jax.Array,  # [M, B, Tc, D] sequence-chunked embeddings, in order
    cos_mb: jax.Array,  # [M, B, Tc, head_dim]
    sin_mb: jax.Array,
    segment_ids_mb: Optional[jax.Array] = None,  # [M, B, Tc]
    mesh: Optional[Mesh] = None,
    remat: bool = True,
) -> jax.Array:
    """Wavefront schedule over sequence chunks. Returns [M, B, Tc, D]
    hidden states (pre-final-norm), chunk-aligned with the inputs."""
    S = jax.tree.leaves(stage_stacks[0])[0].shape[0]
    M, B = x_mb.shape[0], x_mb.shape[1]
    pattern = tuple(cfg.layer_role(j) for j in range(len(stage_stacks)))

    def constrain(t, spec):
        if mesh is None:
            return t
        return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))

    state = jnp.zeros((S,) + x_mb.shape[1:], x_mb.dtype)
    state = constrain(state, P(PIPE, DATA))
    out = jnp.zeros_like(x_mb)
    out = constrain(out, P(None, DATA))
    carries = init_stage_carries(stage_stacks, cfg, B, x_mb.dtype)

    stage_ids = jnp.arange(S)

    def gather_mb(buf, idx):
        return jax.vmap(
            lambda i: jax.lax.dynamic_index_in_dim(
                buf, jnp.clip(i, 0, M - 1), 0, keepdims=False
            )
        )(idx)

    run_stages = jax.vmap(
        lambda stk, car, x, c, s_, seg: _stage_chunk_fn(
            stk, car, cfg, pattern, x, c, s_, seg, remat
        ),
        in_axes=(0, 0, 0, 0, 0, 0 if segment_ids_mb is not None else None),
    )

    def tick(carry, t):
        state, carries, out = carry
        mb_idx = t - stage_ids  # chunk index per stage
        inj = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False
        )
        first = jnp.where(t < M, inj.astype(state.dtype), state[0])
        state = state.at[0].set(first)
        state = constrain(state, P(PIPE, DATA))
        cos_s = gather_mb(cos_mb, mb_idx)
        sin_s = gather_mb(sin_mb, mb_idx)
        seg_s = (
            gather_mb(segment_ids_mb, mb_idx)
            if segment_ids_mb is not None
            else None
        )
        y, new_carries = run_stages(
            stage_stacks, carries, state, cos_s, sin_s, seg_s
        )
        y = constrain(y, P(PIPE, DATA))
        # a stage only holds a real chunk for t in [s, s + M): freeze the
        # recurrent carry on warm-up/drain ticks so bubble garbage never
        # enters the chunk-to-chunk state
        valid = (mb_idx >= 0) & (mb_idx < M)  # [S]
        carries = jax.tree.map(
            lambda new, old: jnp.where(
                valid.reshape((S,) + (1,) * (new.ndim - 1)), new, old
            ),
            new_carries,
            carries,
        )
        out_t = jnp.clip(t - (S - 1), 0, M - 1)
        prev = jax.lax.dynamic_index_in_dim(out, out_t, 0, keepdims=False)
        emit = jnp.where(t >= S - 1, y[S - 1], prev)
        out = jax.lax.dynamic_update_index_in_dim(out, emit, out_t, 0)
        out = constrain(out, P(None, DATA))
        state = jnp.roll(y, 1, axis=0)
        return (state, carries, out), None

    (state, carries, out), _ = jax.lax.scan(
        tick, (state, carries, out), jnp.arange(M + S - 1)
    )
    return out


def seq_pp_sft_loss_fn(
    pp_text_params: Params,
    cfg: TextConfig,
    input_ids: jax.Array,  # [B, T]
    labels: jax.Array,  # [B, T]
    position_ids: jax.Array,  # [3, B, T]
    n_microbatches: int,
    segment_ids: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
    remat: bool = True,
) -> jax.Array:
    """SFT loss with the microbatch axis on the SEQUENCE: T is split into
    n_microbatches contiguous chunks (T % M == 0 and (T/M) % window == 0
    — the SWA carry contract). B is unconstrained, which is the point."""
    from ..models.text import embed_tokens
    from ..ops.norms import rms_norm
    from ..ops.rope import mrope_cos_sin
    from ..train.step import fused_linear_cross_entropy

    B, T = input_ids.shape
    M = n_microbatches
    if T % M:
        raise ValueError(f"T={T} not divisible by {M} sequence chunks")
    Tc = T // M
    if Tc % cfg.sliding_window:
        raise ValueError(
            f"sequence chunk {Tc} must be a multiple of the sliding "
            f"window {cfg.sliding_window} (T={T}, M={M})"
        )

    embeds = embed_tokens(pp_text_params, input_ids)
    cos, sin = mrope_cos_sin(
        position_ids,
        pp_text_params["inv_freq"],
        cfg.mrope_section,
        cfg.attention_scaling,
        dtype=embeds.dtype,
    )

    def chunk(a):  # [B, T, ...] -> [M, B, Tc, ...]
        return jnp.moveaxis(
            a.reshape((B, M, Tc) + a.shape[2:]), 0, 1
        )

    hidden = seq_pipeline_decoder_forward(
        pp_text_params["stage_stacks"], cfg, chunk(embeds), chunk(cos),
        chunk(sin),
        segment_ids_mb=chunk(segment_ids) if segment_ids is not None else None,
        mesh=mesh, remat=remat,
    )
    hidden = jnp.moveaxis(hidden, 0, 1).reshape((B, T, hidden.shape[-1]))
    hidden = rms_norm(hidden, pp_text_params["final_norm"], cfg.rms_norm_eps)
    tied = "lm_head" not in pp_text_params
    w = pp_text_params["embed"] if tied else pp_text_params["lm_head"]
    ce_chunk = 512 if T >= 16384 else 1024
    return fused_linear_cross_entropy(
        hidden, w, labels, chunk=ce_chunk, w_is_vd=tied
    )


def make_seq_pp_sft_train_step(
    cfg: TextConfig,
    tx,
    n_microbatches: int,
    mesh: Optional[Mesh] = None,
    remat: bool = True,
):
    """Sequence-microbatched pipelined train step, same signature as
    pipeline.make_pp_sft_train_step (GPipe schedule; jax.grad through the
    wavefront is the backward)."""
    import optax

    def step(params, opt_state, batch):
        def loss_fn(p):
            return seq_pp_sft_loss_fn(
                p["text"],
                cfg,
                batch["input_ids"],
                batch["labels"],
                batch["position_ids"],
                n_microbatches,
                segment_ids=batch.get("segment_ids"),
                mesh=mesh,
                remat=remat,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
