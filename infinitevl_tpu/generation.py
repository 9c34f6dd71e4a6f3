"""Generation: jitted prefill / decode steps with donated state.

The reference reaches its decode speed through CUDA-graph capture and
preallocated caches (demo_streaming_inference.py:473-489); here the same
static-shape discipline is a `jax.jit` with `donate_argnums` on the state
pytree — XLA updates every ring buffer and recurrent state in place.

prepare_inputs semantics (reference modeling_infinitevl.py:2112-2174):
- prefill computes mRoPE indices via get_rope_index and caches rope_deltas;
- decode positions are cum_len + rope_delta broadcast to all 3 axes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import InfiniteVLConfig
from .models.infinitevl import forward, get_rope_index
from .models.state import DecoderState, init_decoder_state
from .models.text import embed_tokens, lm_head, text_forward

Params = Dict[str, Any]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_thw", "video_grid_thw"),
    donate_argnames=("state",),
)
def prefill(
    params: Params,
    cfg: InfiniteVLConfig,
    input_ids: jax.Array,  # [B, T]
    position_ids: jax.Array,  # [3, B, T]
    state: DecoderState,
    pixel_values: Optional[jax.Array] = None,
    grid_thw: Optional[Tuple[Tuple[int, int, int], ...]] = None,
    pixel_values_videos: Optional[jax.Array] = None,
    video_grid_thw: Optional[Tuple[Tuple[int, int, int], ...]] = None,
) -> Tuple[jax.Array, DecoderState]:
    """Returns (last-token logits [B, vocab], state)."""
    logits, state = forward(
        params,
        cfg,
        input_ids,
        position_ids,
        state=state,
        pixel_values=pixel_values,
        grid_thw=grid_thw,
        pixel_values_videos=pixel_values_videos,
        video_grid_thw=video_grid_thw,
        logits_to_keep=1,
    )
    return logits[:, 0], state


def _decode_step_impl(
    params: Params,
    cfg: InfiniteVLConfig,
    token: jax.Array,  # [B, 1]
    rope_delta: jax.Array,  # [B, 1] int32
    state: DecoderState,
) -> Tuple[jax.Array, DecoderState]:
    """One decode step; position = cum_len + rope_delta on all 3 axes."""
    pos = (state["cum_len"] + rope_delta.astype(jnp.int32))[None]  # [1, B, 1]
    pos = jnp.broadcast_to(pos, (3,) + pos.shape[1:])
    embeds = embed_tokens(params["text"], token)
    hidden, state, _ = text_forward(params["text"], cfg.text, embeds, pos, state)
    logits = lm_head(params["text"], cfg.text, hidden[:, -1])
    return logits, state


# Donating variant: the hot path. The caller must not reuse the passed-in
# state value afterwards — XLA recycles its buffers (ring KV, delta state)
# for the returned state, giving true in-place cache updates.
decode_step = jax.jit(
    _decode_step_impl, static_argnames=("cfg",), donate_argnames=("state",)
)


def _spec_forward_impl(
    params: Params,
    cfg: InfiniteVLConfig,
    tokens: jax.Array,  # [B, K] draft window (first entry = last emitted)
    rope_delta: jax.Array,  # [B, 1] int32
    state: DecoderState,
) -> Tuple[jax.Array, DecoderState]:
    """Token-parallel forward over a K-token decode window, ALL logits kept.

    The speculative-decoding building block (speculative.py): positions are
    cum_len + rope_delta + i exactly as K sequential decode steps would
    assign, but the projections/MLP matmuls run once over K tokens — at
    decode batch sizes the step is weight-read-bound, so verifying K drafts
    costs ~one decode step.

    Losslessness requires conv_carry: sequential decode steps convolve over
    the cached history (short_conv_step), so the window forward must too —
    the default conv_carry=False replicates the reference's zero-history
    multi-token quirk, which here would silently change the first W-1
    window tokens' conv taps (caught by the verify drive; regression test
    in tests/test_speculative.py)."""
    K = tokens.shape[1]
    tcfg = cfg.text
    if not tcfg.conv_carry:
        tcfg = dataclasses.replace(tcfg, conv_carry=True)
    pos = (state["cum_len"] + rope_delta.astype(jnp.int32))[None]  # [1,B,1]
    pos = pos + jnp.arange(K, dtype=jnp.int32)[None, None, :]
    pos = jnp.broadcast_to(pos, (3,) + pos.shape[1:])
    embeds = embed_tokens(params["text"], tokens)
    hidden, state, _ = text_forward(params["text"], tcfg, embeds, pos, state)
    logits = lm_head(params["text"], cfg.text, hidden)  # [B, K, vocab]
    return logits, state


# verify: must NOT donate — on partial acceptance the caller re-runs the
# accepted prefix from the ORIGINAL state (the returned state is only exact
# when every input token is accepted).
spec_verify = jax.jit(_spec_forward_impl, static_argnames=("cfg",))

# commit: re-run the accepted prefix, donating the original state buffers.
spec_commit = jax.jit(
    _spec_forward_impl, static_argnames=("cfg",), donate_argnames=("state",)
)

# Non-donating variant for branched QA: decoding from a snapshot must leave
# the main stream's state buffers intact (the functional analogue of the
# reference's clone_inference_cache, demo_streaming_inference.py:111-160 —
# except no copy is ever made).
decode_step_preserve = jax.jit(_decode_step_impl, static_argnames=("cfg",))


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "steps", "eos", "temperature", "top_k", "top_p", "rep_penalty"
    ),
    donate_argnames=("state",),
)
def decode_chunk(
    params: Params,
    cfg: InfiniteVLConfig,
    token: jax.Array,  # [B, 1] last emitted token (the chunk's input)
    rope_delta: jax.Array,  # [B, 1] int32
    state: DecoderState,
    finished: jax.Array,  # [B] bool carried across chunks
    key: jax.Array,
    steps: int,
    eos: int,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    rep_penalty: float = 1.0,
    seen: Optional[jax.Array] = None,  # [B, vocab] bool; tokens to penalize
) -> Tuple[jax.Array, DecoderState, jax.Array, Optional[jax.Array]]:
    """Decode `steps` tokens in ONE jitted program (a lax.scan of decode
    steps with on-device sampling): the host syncs once per chunk instead of
    once per token — on the relay each sync costs 30-110 ms, and in a real
    deployment it is a dispatch round-trip. EOS is checked on-device per step
    (finished rows keep emitting eos, HF pad semantics) and on the host
    between chunks.

    rep_penalty > 1 applies the HF RepetitionPenaltyLogitsProcessor rule
    (score/p if > 0 else score*p) to every token flagged in `seen` (prompt
    + previously generated, updated on-device each step).

    Returns (tokens [B, steps], state, finished, seen')."""
    use_pen = rep_penalty != 1.0 and seen is not None
    if not use_pen:
        seen = jnp.zeros((), jnp.bool_)  # static placeholder in the carry

    def body(carry, _):
        tok, state, key, finished, seen = carry
        logits, state = _decode_step_impl(params, cfg, tok, rope_delta, state)
        if use_pen:
            pen = jnp.where(
                logits > 0, logits / rep_penalty, logits * rep_penalty
            )
            logits = jnp.where(seen, pen, logits)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits, sub, temperature, top_k, top_p)
        nxt = jnp.where(finished, eos, nxt)
        finished = finished | (nxt == eos)
        if use_pen:
            seen = seen.at[jnp.arange(nxt.shape[0]), nxt].set(True)
        return (nxt[:, None], state, key, finished, seen), nxt

    (token, state, key, finished, seen), toks = jax.lax.scan(
        body, (token, state, key, finished, seen), None, length=steps
    )
    return toks.T, state, finished, (seen if use_pen else None)


def prefill_chunked(
    params: Params,
    cfg: InfiniteVLConfig,
    input_ids: jax.Array,  # [B, T]
    position_ids: jax.Array,  # [3, B, T]
    state: DecoderState,
    chunk: int = 2048,
) -> Tuple[jax.Array, DecoderState]:
    """Long-prompt prefill in fixed-size chunks: compiles at most TWO
    programs (the chunk shape + one remainder shape) regardless of prompt
    length, instead of one giant graph per distinct T. The state pytree
    carries the ring KV / delta state / conv history across chunks — the
    same continuation contract the streaming engine relies on.

    Exact one-shot equality for the DeltaNet conv path needs
    cfg.text.conv_carry=True (the default False replicates the reference's
    zero-history multi-token quirk at every chunk boundary, which is also
    what its own chunked pipelines produce). Text-only: vision features
    should be prefilled through `prefill` or the streaming engine.

    Returns (last-token logits [B, vocab], state)."""
    B, T = input_ids.shape
    n_full = T // chunk
    rem = T % chunk
    logits = None
    for i in range(n_full):
        sl = slice(i * chunk, (i + 1) * chunk)
        logits, state = _prefill_text_step(
            params, cfg, input_ids[:, sl], position_ids[:, :, sl], state,
        )
    if rem:
        logits, state = _prefill_text_step(
            params, cfg, input_ids[:, T - rem :], position_ids[:, :, T - rem :],
            state,
        )
    assert logits is not None, "empty prompt"
    return logits, state


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def _prefill_text_step(params, cfg, ids, pos, state):
    logits, state = forward(params, cfg, ids, pos, state=state, logits_to_keep=1)
    return logits[:, 0], state


def sample_token(
    logits: jax.Array,  # [B, vocab] fp32
    key: Optional[jax.Array] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """Greedy (temperature 0) or top-k/top-p sampling. Returns [B] int32."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits).astype(jnp.int32)


class Generator:
    """Convenience driver for multimodal generate() flows.

    One instance per (config, params); jit caches are shared across calls
    with the same shapes."""

    def __init__(
        self,
        params: Params,
        cfg: InfiniteVLConfig,
        dtype=None,
        chunk_size: int = 8,
        fuse: bool = False,
        quant: Optional[str] = None,
        quant_group_size: Optional[int] = None,
        quant_embed: bool = True,
    ):
        if dtype is None:
            # ring/conv state must match the activations' dtype (the conv
            # carry is written with a dynamic_update_slice, which requires
            # equal dtypes) — infer it from the weights before quantization
            # (an already-quantized embed carries its dtype on the scale)
            tp = params["text"] if "text" in params else params
            emb = tp["embed"] if "embed" in tp else tp["embed_scale"]
            dtype = emb.dtype
        if fuse:
            # opt-in: one matmul per projection group — measured SLOWER on
            # v5e at these shapes (see models/fuse.py); re-measure before use
            from .models.fuse import fuse_projections

            params = fuse_projections(params)
        if quant in ("int8", "int4"):
            # weight-only serving (models/quant.py): int8 halves the decode
            # weight-read floor (measured 167 vs 96 tok/s @500K) and is the
            # recommended default; int4 (bit-packed s4) quarters the weight
            # BYTES but stays slower than int8 on v5e — use for memory
            # headroom. When int4 latency matters, pass a huge
            # quant_group_size (>= hidden) for per-column scales: 121 tok/s
            # vs 75 at group-128 (scripts/probe_int4_g1.py), at coarser
            # quantization. Parity tested in tests/test_quant.py.
            from .models.quant import quantize_params

            qkw = {}
            if quant_group_size is not None:
                qkw["group_size"] = int(quant_group_size)
            # quant_embed (default on): row-wise int8 embed/lm_head table —
            # the tied lm_head matmul reads the full vocab x hidden bytes
            # every decoded token (quantize_embed_rows docstring)
            params = quantize_params(
                params,
                bits=4 if quant == "int4" else 8,
                quantize_embed=quant_embed,
                **qkw,
            )
        elif quant is not None:
            raise ValueError(f"unknown quant mode {quant!r} (use 'int8'/'int4')")
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        # tokens decoded per jitted chunk (1 host sync per chunk); the tail
        # overshoot past EOS is bounded by chunk_size - 1 wasted steps
        self.chunk_size = chunk_size
        # text prompts longer than this prefill through prefill_chunked
        # (bounded compile set for arbitrary prompt lengths). The ring flash
        # kernel blocks queries (ops/swa_pallas.py block_q) so larger chunks
        # fit VMEM; measured at 32K total: 2048 -> 17.6K tok/s, 4096 ->
        # 16.4K (ROUND2_NOTES) — 2048 stays the default.
        self.prefill_chunk_size = 2048

    def generate_speculative(
        self,
        input_ids: np.ndarray,  # [1, T] prompt (text or multimodal)
        max_new_tokens: int = 128,
        draft_k: int = 8,
        eos_token_id: Optional[int] = None,
        stats=None,  # Optional[speculative.SpecStats]
        **mm_kwargs,  # pixel_values / image_grid_thw / videos / ts
    ) -> np.ndarray:
        """Greedy generation with prompt-lookup speculative decoding
        (speculative.py): token-for-token identical output, several drafts
        verified per weight read. Batch-1, greedy; multimodal prompts
        prefill through prefill_prompt. Pass a SpecStats to collect the
        request's measured acceptance."""
        from .speculative import generate_speculative

        return generate_speculative(
            self, input_ids, max_new_tokens=max_new_tokens,
            draft_k=draft_k, eos_token_id=eos_token_id, stats=stats,
            **mm_kwargs,
        )

    def generate_speculative_sampled(
        self,
        input_ids: np.ndarray,  # [1, T] prompt (text or multimodal)
        max_new_tokens: int = 128,
        draft_k: int = 8,
        temperature: float = 0.7,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        eos_token_id: Optional[int] = None,
        stats=None,
        **mm_kwargs,  # pixel_values / image_grid_thw / videos / ts
    ) -> np.ndarray:
        """LOSSLESS sampled speculation (rejection sampling over prompt-
        lookup drafts, speculative.generate_speculative_sampled): the
        emitted stream is distributed exactly as plain temperature/top-k/
        top-p sampling, with several drafts verified per weight read."""
        from .speculative import generate_speculative_sampled

        return generate_speculative_sampled(
            self, input_ids, max_new_tokens=max_new_tokens, draft_k=draft_k,
            temperature=temperature, top_k=top_k, top_p=top_p, seed=seed,
            eos_token_id=eos_token_id, stats=stats, **mm_kwargs,
        )

    def generate_beam(
        self,
        input_ids: np.ndarray,  # [B, T] text-only
        num_beams: int = 4,
        max_new_tokens: int = 128,
        eos_token_id: Optional[int] = None,
        length_penalty: float = 1.0,
        early_stopping=False,
    ) -> np.ndarray:
        """Beam search (beam.py): HF BeamSearchScorer semantics with a
        jitted beam-expanded decode step; parity-tested vs transformers
        generate(num_beams=K) in tests/test_beam.py."""
        from .beam import beam_search

        return beam_search(
            self, input_ids, num_beams=num_beams,
            max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
            length_penalty=length_penalty, early_stopping=early_stopping,
        )

    def generate(
        self,
        input_ids: np.ndarray,  # [B, T]
        eos_token_id: Optional[int] = None,
        **kwargs,
    ) -> np.ndarray:
        """Full generation: collects generate_stream and trims the chunk
        overshoot (each row keeps its own first EOS, HF pad semantics)."""
        eos = (
            eos_token_id if eos_token_id is not None else self.cfg.eos_token_id
        )
        chunks = list(
            self.generate_stream(input_ids, eos_token_id=eos, **kwargs)
        )
        out = np.concatenate(chunks, axis=1)
        # drop columns that are EOS padding for every row (chunked decode can
        # overshoot by < chunk_size)
        eos_before = np.cumsum(out == eos, axis=1) - (out == eos)
        pad_col = (eos_before >= 1).all(axis=0)
        keep = int(np.argmax(pad_col)) if pad_col.any() else out.shape[1]
        return out[:, :keep]

    def prefill_prompt(
        self,
        input_ids: np.ndarray,  # [B, T]
        pixel_values: Optional[np.ndarray] = None,
        image_grid_thw: Optional[np.ndarray] = None,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        second_per_grid_ts=None,
        state: Optional[DecoderState] = None,
    ) -> Tuple[jax.Array, DecoderState, jax.Array]:
        """Shared prompt prefill for every decode-loop entry point
        (generate_stream, speculative, beam): computes mrope indices
        (get_rope_index), validates vision placeholders against the grids
        (reference get_placeholder_mask, modeling_infinitevl.py:1812-1827),
        routes long TEXT prompts through the bounded-compile chunked
        prefill, and returns (last-token logits, state, rope_delta)."""
        cfg = self.cfg
        B = input_ids.shape[0]
        pos, deltas = get_rope_index(
            cfg,
            input_ids,
            image_grid_thw,
            video_grid_thw,
            second_per_grid_ts,
        )
        if state is None:
            state = init_decoder_state(cfg.text, B, dtype=self.dtype)
        # count check: host-side, pre-jit
        merge2 = cfg.vision.spatial_merge_unit

        def _check(grids_arr, token_id, kind):
            if grids_arr is None:
                raise ValueError(
                    f"{kind} pixel values passed without the matching "
                    f"{kind}_grid_thw"
                )
            grids = tuple(tuple(int(x) for x in g) for g in grids_arr)
            n_feats = sum(t * h * w for t, h, w in grids) // merge2
            n_pads = int((input_ids == token_id).sum())
            if n_pads != n_feats:
                raise ValueError(
                    f"{kind} features and pad tokens do not match: "
                    f"{n_feats} features vs {n_pads} pad tokens"
                )
            return grids

        grid = vgrid = None
        pv = pvv = None
        if pixel_values is not None:
            # legacy call pattern: images and videos pre-concatenated into
            # pixel_values with no separate video tensor
            if pixel_values_videos is None and video_grid_thw is not None:
                grids = []
                if image_grid_thw is not None:
                    grids += [tuple(int(x) for x in g) for g in image_grid_thw]
                grids += [tuple(int(x) for x in g) for g in video_grid_thw]
                grid = tuple(grids)
            else:
                grid = _check(image_grid_thw, cfg.image_token_id, "image")
            pv = jnp.asarray(pixel_values)
        if pixel_values_videos is not None:
            vgrid = _check(video_grid_thw, cfg.video_token_id, "video")
            pvv = jnp.asarray(pixel_values_videos)
        if (
            pv is None
            and pvv is None
            and input_ids.shape[1] > self.prefill_chunk_size
        ):
            # long text prompt: bounded compile set via chunked prefill
            logits, state = prefill_chunked(
                self.params, cfg, jnp.asarray(input_ids), jnp.asarray(pos),
                state, chunk=self.prefill_chunk_size,
            )
        else:
            logits, state = prefill(
                self.params, cfg, jnp.asarray(input_ids), jnp.asarray(pos), state,
                pixel_values=pv, grid_thw=grid,
                pixel_values_videos=pvv, video_grid_thw=vgrid,
            )
        return logits, state, jnp.asarray(deltas, dtype=jnp.int32)

    def generate_stream(
        self,
        input_ids: np.ndarray,  # [B, T]
        pixel_values: Optional[np.ndarray] = None,
        image_grid_thw: Optional[np.ndarray] = None,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        second_per_grid_ts=None,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        repetition_penalty: float = 1.0,
        seed: int = 0,
        eos_token_id: Optional[int] = None,
        state: Optional[DecoderState] = None,
    ):
        """TRUE token streaming: yields np token chunks ([B, 1] for the first
        sampled token, then [B, <=chunk_size] per jitted decode chunk) as
        they are produced — the TPU counterpart of the reference's
        TextIteratorStreamer (chat/hf_engine.py:45-415). One host sync per
        chunk."""
        cfg = self.cfg
        B = input_ids.shape[0]
        eos = eos_token_id if eos_token_id is not None else cfg.eos_token_id
        logits, state, rope_delta = self.prefill_prompt(
            input_ids,
            pixel_values=pixel_values,
            image_grid_thw=image_grid_thw,
            pixel_values_videos=pixel_values_videos,
            video_grid_thw=video_grid_thw,
            second_per_grid_ts=second_per_grid_ts,
            state=state,
        )
        seen = None
        if repetition_penalty != 1.0:
            # HF RepetitionPenaltyLogitsProcessor semantics: penalize every
            # token already in the sequence, prompt included
            seen_np = np.zeros((B, cfg.text.vocab_size), np.bool_)
            np.put_along_axis(seen_np, np.asarray(input_ids), True, axis=1)
            seen = jnp.asarray(seen_np)
            pen = jnp.where(
                logits > 0, logits / repetition_penalty,
                logits * repetition_penalty,
            )
            logits = jnp.where(seen, pen, logits)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        tok = sample_token(logits, sub, temperature, top_k, top_p)
        t0 = np.asarray(tok)  # first generated token (one sync)
        yield t0[:, None]
        finished = jnp.asarray(t0 == eos)
        if max_new_tokens <= 1 or bool(np.all(t0 == eos)):
            return
        tok_in = jnp.asarray(t0)[:, None]
        if seen is not None:
            seen = seen.at[jnp.arange(B), jnp.asarray(t0)].set(True)
        remaining = max_new_tokens - 1
        while remaining > 0:
            steps = min(self.chunk_size, remaining)
            key, sub = jax.random.split(key)
            toks, state, finished, seen = decode_chunk(
                self.params, cfg, tok_in, rope_delta, state, finished, sub,
                steps=steps, eos=eos,
                temperature=temperature, top_k=top_k, top_p=top_p,
                rep_penalty=repetition_penalty, seen=seen,
            )
            yield np.asarray(toks)  # ONE host sync per chunk
            remaining -= steps
            if bool(np.asarray(finished).all()):
                return
            tok_in = toks[:, -1:]
