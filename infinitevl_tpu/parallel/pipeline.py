"""Pipeline parallelism (GPipe schedule) as pure GSPMD — no shard_map.

The reference only *declares* pipeline stages (`base_model_pp_plan`,
configuration_infinitevl.py:202-206) and never executes them; device_map
big-model inference is its only cross-device layer placement. Here PP is a
first-class schedule, built the TPU way (the maxtext/praxis pattern):

- stage-stacked parameters: every layer tree carries a leading [S] stage
  axis sharded over the `pipe` mesh axis, so each stage's weights live
  only on its own devices;
- the stage computation is `jax.vmap` over that axis — XLA partitions the
  vmapped body so each stage runs on its own device group in parallel;
- the activation hand-off between consecutive stages is `jnp.roll` on the
  stage axis, which GSPMD lowers to a collective-permute on ICI;
- the GPipe schedule is one `lax.scan` over M + S - 1 ticks: microbatch m
  enters stage 0 at tick m, exits stage S-1 at tick m + S - 1. Bubble
  fraction (S-1)/(M+S-1), the GPipe bound.

Because everything stays inside GSPMD (no manual-axes shard_map), the
`data` and `model` mesh axes keep working untouched: TP sharding of the
per-layer weights and DP sharding of the microbatch dimension compose with
PP by annotation only. Gradients flow through roll/gather reverses, so
`jax.grad` of the pipelined loss IS the GPipe backward schedule.

Stages are cut at hybrid-period granularity (the deployed config repeats
(sliding, linear, linear, linear), so 36 layers = 9 periods and S must
divide 9); every stage then has an identical parameter structure, which is
what lets the stage axis be a plain leading array dimension.

The embedding lookup, final norm, and LM head run replicated across the
pipe axis (they are < 2% of step FLOPs at 3B; stage-0/stage-(S-1)-only
placement would add two more collectives for no memory win — the embed
table is already shared with the head by weight tying).
"""

from __future__ import annotations

import functools
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TextConfig
from ..models.stacked import detect_period, stack_layer_params
from ..models.text import decoder_layer_forward
from .sharding import DATA, MODEL, param_spec

PIPE = "pipe"

Params = Dict[str, Any]


def create_pp_mesh(
    pipe: int, data: int = 1, model: int = 1, devices=None
) -> Mesh:
    """Mesh with a leading pipeline axis: (pipe, data, model). The pipe
    axis carries one activation hand-off per tick (cheap, point-to-point)
    so it may span the slower topology dimension; data/model follow the
    create_hybrid_mesh rule (model innermost on ICI)."""
    devices = devices if devices is not None else jax.devices()
    n = pipe * data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(pipe, data, model)
    return Mesh(arr, (PIPE, DATA, MODEL))


def stack_stage_params(
    text_params: Params, cfg: TextConfig, n_stages: int
) -> Params:
    """Restack params["layers"] into per-stage trees: `stage_stacks` is a
    list of `period` trees whose leaves have leading dims [S, G/S] (stage,
    local-period). Host-side, like models/stacked.stack_layer_params — done
    once before jit so the weights are not copied in-graph."""
    roles = tuple(
        cfg.layer_role(i) for i in range(len(text_params["layers"]))
    )
    period = detect_period(roles)
    if period is None:
        raise ValueError(f"layer pattern {roles} has no period")
    L = len(roles)
    G = L // period
    if G % n_stages:
        raise ValueError(
            f"{n_stages} stages must divide the {G} pattern periods "
            f"({L} layers, period {period})"
        )
    stacked = stack_layer_params(text_params, period)
    local = G // n_stages
    stage_stacks = [
        jax.tree.map(
            lambda x: x.reshape((n_stages, local) + x.shape[1:]), tree
        )
        for tree in stacked["layer_stacks"]
    ]
    out = {k: v for k, v in stacked.items() if k != "layer_stacks"}
    out["stage_stacks"] = stage_stacks
    return out


def unstack_stage_params(pp_params: Params) -> Params:
    """Inverse of stack_stage_params (export / parity checks)."""
    from ..models.stacked import unstack_layer_params

    stacks = pp_params["stage_stacks"]
    period = len(stacks)
    flat = [
        jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), t)
        for t in stacks
    ]
    out = {k: v for k, v in pp_params.items() if k != "stage_stacks"}
    out["layer_stacks"] = flat
    G = jax.tree.leaves(flat[0])[0].shape[0]
    return unstack_layer_params(out, period, G * period)


def _pp_leaf_spec(subpath: str, shape, mesh: Mesh, param_mode: str) -> P:
    """Sharding spec for one stage-stacked leaf: stage axis on `pipe`,
    local-period axis replicated, inner dims by the per-layer rule table
    (the synthesized path `text/layers/0/<subpath>` hits the same rules
    as unstacked params)."""
    inner = param_spec(
        f"text/layers/0/{subpath}", shape[2:], mesh, param_mode
    )
    return P(PIPE, None, *tuple(inner))


def pp_param_shardings(
    pp_params: Params, mesh: Mesh, param_mode: str = "tp"
):
    """NamedSharding pytree for {"text": stack_stage_params(...)} params
    (use as jit in_shardings / for device_put)."""

    def place(path, x):
        parts = []
        for p in path:
            parts.append(str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p)))
        name = "/".join(parts)
        m = re.match(r"text/stage_stacks/\d+/(.*)", name)
        if m:
            spec = _pp_leaf_spec(m.group(1), x.shape, mesh, param_mode)
        else:
            spec = param_spec(name, x.shape, mesh, param_mode)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(place, pp_params)


def shard_pp_params(pp_params: Params, mesh: Mesh, param_mode: str = "tp"):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        pp_params,
        pp_param_shardings(pp_params, mesh, param_mode),
    )


def _stage_fn(
    stacks_s: Sequence[Any],  # per-period trees, leaves [local, ...]
    cfg: TextConfig,
    pattern: Tuple[str, ...],
    x: jax.Array,  # [mB, T, D]
    cos: jax.Array,
    sin: jax.Array,
    segment_ids: Optional[jax.Array],
    remat: bool,
) -> jax.Array:
    """One pipeline stage: scan over its local pattern periods (same body
    as text_forward's layer_stacks branch — one HLO loop, so the backward
    holds one period's residuals at a time)."""

    def body(x, slices):
        for j, role in enumerate(pattern):
            layer_fn = functools.partial(
                decoder_layer_forward, cfg=cfg, role=role
            )
            if remat:
                layer_fn = jax.checkpoint(
                    lambda lp, x, _f=layer_fn: _f(
                        lp, x=x, cos=cos, sin=sin, layer_state=None,
                        segment_ids=segment_ids,
                    )
                )
                x, _ = layer_fn(slices[j], x)
            else:
                x, _ = layer_fn(
                    slices[j], x=x, cos=cos, sin=sin, layer_state=None,
                    segment_ids=segment_ids,
                )
        return x, None

    scan_body = jax.checkpoint(body) if remat else body
    x, _ = jax.lax.scan(scan_body, x, tuple(stacks_s))
    return x


def pipeline_decoder_forward(
    stage_stacks: Sequence[Any],  # per-period trees, leaves [S, local, ...]
    cfg: TextConfig,
    x_mb: jax.Array,  # [M, mB, T, D] microbatched embeddings
    cos_mb: jax.Array,  # [M, mB, T, head_dim]
    sin_mb: jax.Array,
    segment_ids_mb: Optional[jax.Array] = None,  # [M, mB, T]
    mesh: Optional[Mesh] = None,
    remat: bool = True,
) -> jax.Array:
    """GPipe over the decoder trunk. Returns [M, mB, T, D] hidden states
    (pre-final-norm), microbatch-aligned with the inputs."""
    S = jax.tree.leaves(stage_stacks[0])[0].shape[0]
    M = x_mb.shape[0]
    pattern = tuple(cfg.layer_role(j) for j in range(len(stage_stacks)))

    def constrain(t, spec):
        if mesh is None:
            return t
        return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))

    # per-stage activation buffer: stage s's in-flight microbatch
    state = jnp.zeros((S,) + x_mb.shape[1:], x_mb.dtype)
    state = constrain(state, P(PIPE, DATA))
    out = jnp.zeros_like(x_mb)
    out = constrain(out, P(None, DATA))

    stage_ids = jnp.arange(S)

    def gather_mb(buf, idx):
        # stage s works on microbatch idx[s]; buf is pipe-replicated so the
        # vmapped dynamic gather is local to each stage's devices
        return jax.vmap(
            lambda i: jax.lax.dynamic_index_in_dim(
                buf, jnp.clip(i, 0, M - 1), 0, keepdims=False
            )
        )(idx)

    run_stages = jax.vmap(
        lambda stk, x, c, s_, seg: _stage_fn(
            stk, cfg, pattern, x, c, s_, seg, remat
        ),
        in_axes=(0, 0, 0, 0, 0 if segment_ids_mb is not None else None),
    )

    def tick(carry, t):
        state, out = carry
        mb_idx = t - stage_ids  # microbatch index per stage
        # inject microbatch t into stage 0 while t < M
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
        y = run_stages(stage_stacks, state, cos_s, sin_s, seg_s)
        y = constrain(y, P(PIPE, DATA))
        # stage S-1 finished microbatch t-(S-1)
        out_t = jnp.clip(t - (S - 1), 0, M - 1)
        prev = jax.lax.dynamic_index_in_dim(out, out_t, 0, keepdims=False)
        emit = jnp.where(t >= S - 1, y[S - 1], prev)
        out = jax.lax.dynamic_update_index_in_dim(out, emit, out_t, 0)
        out = constrain(out, P(None, DATA))
        # advance: stage s+1's next input is stage s's output
        state = jnp.roll(y, 1, axis=0)
        return (state, out), None

    (state, out), _ = jax.lax.scan(
        tick, (state, out), jnp.arange(M + S - 1)
    )
    return out


def pp_sft_loss_fn(
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
    """SFT loss over the pipelined decoder. Microbatches split the batch
    dimension: B % n_microbatches == 0 (and mB should stay divisible by
    the data axis so DP sharding survives the split)."""
    from ..models.text import embed_tokens
    from ..ops.norms import rms_norm
    from ..ops.rope import mrope_cos_sin
    from ..train.step import fused_linear_cross_entropy

    B, T = input_ids.shape
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mB = B // M

    embeds = embed_tokens(pp_text_params, input_ids)
    cos, sin = mrope_cos_sin(
        position_ids,
        pp_text_params["inv_freq"],
        cfg.mrope_section,
        cfg.attention_scaling,
        dtype=embeds.dtype,
    )
    x_mb = embeds.reshape((M, mB, T, embeds.shape[-1]))
    cos_mb = cos.reshape((M, mB) + cos.shape[1:])
    sin_mb = sin.reshape((M, mB) + sin.shape[1:])
    seg_mb = (
        segment_ids.reshape((M, mB, T)) if segment_ids is not None else None
    )

    hidden = pipeline_decoder_forward(
        pp_text_params["stage_stacks"], cfg, x_mb, cos_mb, sin_mb,
        segment_ids_mb=seg_mb, mesh=mesh, remat=remat,
    )
    hidden = hidden.reshape((B, T, hidden.shape[-1]))
    hidden = rms_norm(hidden, pp_text_params["final_norm"], cfg.rms_norm_eps)
    tied = "lm_head" not in pp_text_params
    w = pp_text_params["embed"] if tied else pp_text_params["lm_head"]
    # same chunk rule as the plain SFT path (train/step.py:182): each fp32
    # logits chunk is chunk x V x 4 B — the 512-at-16K+ shrink is the
    # margin that decides whether long-context recipes fit one chip
    ce_chunk = 512 if T >= 16384 else 1024
    return fused_linear_cross_entropy(
        hidden, w, labels, chunk=ce_chunk, w_is_vd=tied
    )


def pp_sft_value_and_grad_1f1b(
    pp_text_params: Params,
    cfg: TextConfig,
    input_ids: jax.Array,  # [B, T]
    labels: jax.Array,  # [B, T]
    position_ids: jax.Array,  # [3, B, T]
    n_microbatches: int,
    segment_ids: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
    remat: bool = True,
) -> Tuple[jax.Array, Params]:
    """1F1B (PipeDream-flush) schedule: hand-written forward+backward in ONE
    scan, returning (loss, grads) — numerically identical to jax.grad of the
    GPipe schedule, but with bounded activation memory.

    Why it exists: jax.grad of `pipeline_decoder_forward` IS the GPipe
    backward, and reverse-of-scan saves every tick's carry — the boundary
    activations grow O(M·S·act) with the microbatch count, which is exactly
    the axis PP wants to scale (more microbatches = smaller bubble). Here
    each stage keeps only a ring of its last 2S-1 microbatch INPUTS and
    recomputes the stage forward inside the backward (the remat the GPipe
    path already pays), so activation memory is O(S²·act), independent of M.

    Schedule (lockstep double-ticks, u = 0..M+2S-3; every tick all stages
    run one forward AND one backward, bubble slots masked):
      fwd:  stage s runs microbatch  u - s            (GPipe timing)
      head: loss + dL/dh for microbatch u - (S-1), the tick it exits
      bwd:  stage s runs microbatch  u - (2S-2-s)     (cotangent ripples
            back one stage per tick, via the reverse roll)
    Stage s holds a forwarded microbatch for 2(S-1-s) ticks, hence the
    2S-1 ring bound. Same bubble fraction as GPipe — 1F1B's win is memory,
    which is what un-caps n_microbatches.

    Gradient bookkeeping mirrors jax.grad exactly: per-tick stage vjps
    accumulate stage-stacked param grads and emit dx/dcos/dsin cotangents;
    dcos/dsin are scatter-added per microbatch and pulled back through one
    prelude vjp (embed lookup + mrope_cos_sin) so embed/inv_freq grads
    match the autodiff paths (inv_freq gets a real gradient there too).
    Loss = sum-NLL / token-count over the full batch, so all cotangents run
    at sum scale and every grad is divided by the count once at the end."""
    from ..models.text import embed_tokens
    from ..ops.norms import rms_norm
    from ..ops.rope import mrope_cos_sin
    from ..train.step import IGNORE_INDEX, fused_linear_cross_entropy

    B, T = input_ids.shape
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mB = B // M
    stage_stacks = pp_text_params["stage_stacks"]
    S = jax.tree.leaves(stage_stacks[0])[0].shape[0]
    pattern = tuple(cfg.layer_role(j) for j in range(len(stage_stacks)))
    R = 2 * S - 1  # saved-input ring depth per stage
    U = M + 2 * S - 2  # total double-ticks

    def constrain(t, spec):
        if mesh is None:
            return t
        return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))

    # ---- prelude (run forward now; vjp'd once at the end) ----
    tied = "lm_head" not in pp_text_params
    w_key = "embed" if tied else "lm_head"
    pre_p = {
        "embed": pp_text_params["embed"],
        "inv_freq": pp_text_params["inv_freq"],
    }

    def prelude(p):
        e = embed_tokens(p, input_ids)
        cos, sin = mrope_cos_sin(
            position_ids, p["inv_freq"], cfg.mrope_section,
            cfg.attention_scaling, dtype=e.dtype,
        )
        return e, cos, sin

    (embeds, cos, sin), prelude_pull = jax.vjp(prelude, pre_p)
    D = embeds.shape[-1]
    hd = cos.shape[-1]
    x_mb = embeds.reshape((M, mB, T, D))
    cos_mb = cos.reshape((M, mB) + cos.shape[1:])
    sin_mb = sin.reshape((M, mB) + sin.shape[1:])
    seg_mb = (
        segment_ids.reshape((M, mB, T)) if segment_ids is not None else None
    )
    labels_mb = labels.reshape((M, mB, T))

    # ---- head: per-microbatch sum-NLL over (final_norm, lm weights) ----
    head_p = {"final_norm": pp_text_params["final_norm"],
              w_key: pp_text_params[w_key]}
    ce_chunk = 512 if T >= 16384 else 1024

    def head_nll_sum(hp, h_m, lb_m):
        h = rms_norm(h_m, hp["final_norm"], cfg.rms_norm_eps)
        cnt = jnp.maximum((lb_m != IGNORE_INDEX).sum(), 1)
        mean = fused_linear_cross_entropy(
            h, hp[w_key], lb_m, chunk=ce_chunk, w_is_vd=tied
        )
        return mean * cnt.astype(mean.dtype)

    stage_ids = jnp.arange(S)

    def gather_mb(buf, idx):
        return jax.vmap(
            lambda i: jax.lax.dynamic_index_in_dim(
                buf, jnp.clip(i, 0, M - 1), 0, keepdims=False
            )
        )(idx)

    seg_axis = 0 if seg_mb is not None else None
    run_stages = jax.vmap(
        lambda stk, x, c, s_, seg: _stage_fn(
            stk, cfg, pattern, x, c, s_, seg, remat
        ),
        in_axes=(0, 0, 0, 0, seg_axis),
    )

    def stage_bwd(stk, x, c, s_, seg, ct_s):
        f = lambda stk_, x_, c_, sn_: _stage_fn(
            stk_, cfg, pattern, x_, c_, sn_, seg, remat
        )
        _, pull = jax.vjp(f, stk, x, c, s_)
        return pull(ct_s)

    run_stages_bwd = jax.vmap(
        stage_bwd, in_axes=(0, 0, 0, 0, seg_axis, 0)
    )

    state0 = constrain(jnp.zeros((S, mB, T, D), embeds.dtype), P(PIPE, DATA))
    saved0 = constrain(
        jnp.zeros((S, R, mB, T, D), embeds.dtype), P(PIPE, None, DATA)
    )
    ct0 = constrain(jnp.zeros((S, mB, T, D), embeds.dtype), P(PIPE, DATA))
    gstk0 = jax.tree.map(jnp.zeros_like, stage_stacks)
    ghead0 = jax.tree.map(jnp.zeros_like, head_p)
    d_emb0 = constrain(jnp.zeros((M, mB, T, D), embeds.dtype), P(None, DATA))
    d_cos0 = jnp.zeros((M, mB, T, hd), cos.dtype)
    d_sin0 = jnp.zeros((M, mB, T, hd), sin.dtype)
    nll0 = jnp.float32(0.0)

    def tick(carry, u):
        state, saved, ct, gstk, ghead, d_emb, d_cos, d_sin, nll = carry
        fm = u - stage_ids  # [S] fwd microbatch per stage
        bm = u - (2 * S - 2 - stage_ids)  # [S] bwd microbatch per stage
        fw_ok = (fm >= 0) & (fm < M)
        bw_ok = (bm >= 0) & (bm < M)
        hm = u - (S - 1)
        head_ok = (hm >= 0) & (hm < M)

        # ---- forward (GPipe timing) ----
        inj = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(u, 0, M - 1), 0, keepdims=False
        )
        first = jnp.where(u < M, inj.astype(state.dtype), state[0])
        state = constrain(state.at[0].set(first), P(PIPE, DATA))
        cos_f = gather_mb(cos_mb, fm)
        sin_f = gather_mb(sin_mb, fm)
        seg_f = gather_mb(seg_mb, fm) if seg_mb is not None else None
        y = run_stages(stage_stacks, state, cos_f, sin_f, seg_f)
        y = constrain(y, P(PIPE, DATA))

        # save this tick's stage INPUTS into the per-stage ring (only
        # valid forwards may write — a clipped write would clobber a
        # live slot during drain)
        slot_f = jnp.mod(jnp.clip(fm, 0, M - 1), R)

        def wr(buf_s, x_s, i_s, ok_s):
            old = jax.lax.dynamic_index_in_dim(buf_s, i_s, 0, keepdims=False)
            new = jnp.where(ok_s, x_s, old)
            return jax.lax.dynamic_update_index_in_dim(buf_s, new, i_s, 0)

        saved = jax.vmap(wr)(saved, state, slot_f, fw_ok)
        saved = constrain(saved, P(PIPE, None, DATA))

        # ---- head: microbatch hm exits stage S-1 this tick ----
        lb_m = jax.lax.dynamic_index_in_dim(
            labels_mb, jnp.clip(hm, 0, M - 1), 0, keepdims=False
        )
        nll_m, head_pull = jax.vjp(
            lambda hp, h: head_nll_sum(hp, h, lb_m), head_p, y[S - 1]
        )
        ct_scalar = jnp.where(head_ok, 1.0, 0.0).astype(nll_m.dtype)
        dhp, ct_head = head_pull(ct_scalar)
        nll = nll + jnp.where(head_ok, nll_m.astype(jnp.float32), 0.0)
        ghead = jax.tree.map(jnp.add, ghead, dhp)
        ct = ct.at[S - 1].set(ct_head.astype(ct.dtype))

        # ---- backward (cotangent zeroed on bubble slots; vjp is linear
        # in the cotangent, so masked slots contribute exactly zero) ----
        slot_b = jnp.mod(jnp.clip(bm, 0, M - 1), R)
        x_b = jax.vmap(
            lambda buf_s, i_s: jax.lax.dynamic_index_in_dim(
                buf_s, i_s, 0, keepdims=False
            )
        )(saved, slot_b)
        cos_b = gather_mb(cos_mb, bm)
        sin_b = gather_mb(sin_mb, bm)
        seg_b = gather_mb(seg_mb, bm) if seg_mb is not None else None
        ct_use = jnp.where(bw_ok[:, None, None, None], ct, 0)
        dstk, dx, dcos, dsin = run_stages_bwd(
            stage_stacks, x_b, cos_b, sin_b, seg_b, ct_use
        )
        gstk = jax.tree.map(jnp.add, gstk, dstk)
        d_emb = d_emb.at[jnp.clip(bm[0], 0, M - 1)].add(
            jnp.where(bw_ok[0], dx[0], 0)
        )
        d_emb = constrain(d_emb, P(None, DATA))
        bmask = bw_ok[:, None, None, None]
        idx_b = jnp.clip(bm, 0, M - 1)
        d_cos = d_cos.at[idx_b].add(jnp.where(bmask, dcos, 0))
        d_sin = d_sin.at[idx_b].add(jnp.where(bmask, dsin, 0))

        # advance both pipelines: activations roll down, cotangents roll up
        state = constrain(jnp.roll(y, 1, axis=0), P(PIPE, DATA))
        ct = constrain(jnp.roll(dx, -1, axis=0), P(PIPE, DATA))
        return (
            state, saved, ct, gstk, ghead, d_emb, d_cos, d_sin, nll
        ), None

    carry = (
        state0, saved0, ct0, gstk0, ghead0, d_emb0, d_cos0, d_sin0, nll0
    )
    carry, _ = jax.lax.scan(tick, carry, jnp.arange(U))
    _, _, _, gstk, ghead, d_emb, d_cos, d_sin, nll = carry

    (dpre,) = prelude_pull(
        (
            d_emb.reshape(B, T, D),
            d_cos.reshape(B, T, hd),
            d_sin.reshape(B, T, hd),
        )
    )

    cnt = jnp.maximum((labels != IGNORE_INDEX).sum(), 1)
    loss = nll / cnt.astype(jnp.float32)
    scale = 1.0 / cnt.astype(jnp.float32)

    def scaled(g):
        return (g.astype(jnp.float32) * scale).astype(g.dtype)

    grads: Params = {
        k: jax.tree.map(jnp.zeros_like, v)
        for k, v in pp_text_params.items()
    }
    grads["stage_stacks"] = jax.tree.map(scaled, gstk)
    grads["final_norm"] = scaled(ghead["final_norm"])
    grads["inv_freq"] = scaled(dpre["inv_freq"])
    g_embed = dpre["embed"]
    if tied:
        g_embed = g_embed + ghead["embed"]
    else:
        grads["lm_head"] = scaled(ghead["lm_head"])
    grads["embed"] = scaled(g_embed)
    return loss, grads


def make_pp_sft_train_step(
    cfg: TextConfig,
    tx,
    n_microbatches: int,
    mesh: Optional[Mesh] = None,
    remat: bool = True,
    schedule: str = "gpipe",
):
    """Pipelined (params, opt_state, batch) -> (params, opt_state, loss).
    params = {"text": stack_stage_params(...)}.

    schedule="gpipe": jax.grad through pipeline_decoder_forward — the GPipe
    backward (reverse ticks, reverse collectives); activation memory grows
    with n_microbatches. schedule="1f1b": the hand-scheduled
    pp_sft_value_and_grad_1f1b — same numbers, O(S²) activation memory."""
    import optax

    if schedule not in ("gpipe", "1f1b"):
        raise ValueError(
            f"unknown pipeline schedule {schedule!r} (gpipe | 1f1b)"
        )

    def step(params, opt_state, batch):
        if schedule == "1f1b":
            loss, gtext = pp_sft_value_and_grad_1f1b(
                params["text"],
                cfg,
                batch["input_ids"],
                batch["labels"],
                batch["position_ids"],
                n_microbatches,
                segment_ids=batch.get("segment_ids"),
                mesh=mesh,
                remat=remat,
            )
            grads = {"text": gtext}
        else:

            def loss_fn(p):
                return pp_sft_loss_fn(
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
