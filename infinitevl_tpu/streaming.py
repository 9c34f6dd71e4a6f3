"""Streaming video inference engine.

TPU-native replacement for the reference CUDA-graph streaming demo
(inference_examples/demo_streaming_inference.py): the per-frame update is a
single jitted function with static shapes and a donated state pytree —
trace once, replay forever, the same property the reference buys with
torch.cuda.CUDAGraph capture (demo:262,473-489).

Position semantics (demo:237-247,444-467): every stream frame reuses the
same spatial (h, w) mRoPE base positions; only the temporal axis advances,
by t_offset = grid_t * tokens_per_grid where grid_t indexes wall-clock time
in second_per_grid_ts units. QA branches start at max(position)+1.

Branched QA (demo:357-438) needs no cache cloning: the state pytree is a
value; the branch decodes with non-donating steps while the main stream
keeps the original buffers.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import InfiniteVLConfig
from .generation import decode_chunk, prefill
from .models.infinitevl import get_rope_index, scatter_vision_embeds
from .models.state import DecoderState, init_decoder_state
from .models.text import embed_tokens, lm_head, text_forward
from .models.vision import get_vision_plan, vision_forward

Params = Dict[str, Any]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_thw"),
    donate_argnames=("state",),
)
def stream_frame_step(
    params: Params,
    cfg: InfiniteVLConfig,
    pixel_values: jax.Array,  # [n_patches, in_feat] one frame
    frame_input_ids: jax.Array,  # [1, 1 + n_tok] <vision_start> + image pads
    pos_base: jax.Array,  # scalar int32: position of <vision_start>
    t_offset: jax.Array,  # scalar int32: temporal mrope offset for this frame
    state: DecoderState,
    grid_thw: Tuple[Tuple[int, int, int], ...] = ((1, 32, 32),),
) -> DecoderState:
    """Ingest one video frame into the streaming state. Fully on-device,
    compiled once per frame-shape bucket."""
    plan = get_vision_plan(grid_thw, cfg.vision)
    vis = vision_forward(params["visual"], cfg.vision, pixel_values, plan)

    embeds = embed_tokens(params["text"], frame_input_ids)
    mask = frame_input_ids == cfg.image_token_id
    embeds = scatter_vision_embeds(embeds, vis, mask)

    T = frame_input_ids.shape[1]
    n_tok = T - 1
    m = cfg.vision.spatial_merge_size
    lh, lw = grid_thw[0][1] // m, grid_thw[0][2] // m
    h_idx = jnp.repeat(jnp.arange(lh, dtype=jnp.int32), lw)
    w_idx = jnp.tile(jnp.arange(lw, dtype=jnp.int32), lh)
    grid_base = pos_base + 1
    pos_t = jnp.concatenate(
        [pos_base[None], grid_base + t_offset + jnp.zeros(n_tok, jnp.int32)]
    )
    pos_h = jnp.concatenate([pos_base[None], grid_base + h_idx])
    pos_w = jnp.concatenate([pos_base[None], grid_base + w_idx])
    pos = jnp.stack([pos_t, pos_h, pos_w])[:, None, :]  # [3, 1, T]

    _, state, _ = text_forward(params["text"], cfg.text, embeds, pos, state)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_thw"),
    donate_argnames=("state",),
)
def stream_frame_step_raw(
    params: Params,
    cfg: InfiniteVLConfig,
    raw_frame: jax.Array,  # [H, W, C] uint8, already sized to the bucket
    frame_input_ids: jax.Array,
    pos_base: jax.Array,
    t_offset: jax.Array,
    state: DecoderState,
    grid_thw: Tuple[Tuple[int, int, int], ...] = ((1, 32, 32),),
) -> DecoderState:
    """Raw-uint8 variant: CLIP-normalize + patchify runs inside XLA on
    device (data/processing.patchify_device), so the host ships 3 bytes per
    pixel and preprocessing is fused into the frame step — the input
    pipeline never stalls the encoder."""
    from .data.processing import patchify_device

    v = cfg.vision
    # [H, W, C] single frame (duplicated to fill the temporal patch) or
    # [T, H, W, C] clip (paired mode: real frames per temporal unit)
    frames = raw_frame if raw_frame.ndim == 4 else raw_frame[None]
    pixels = patchify_device(
        frames,
        v.patch_size,
        v.temporal_patch_size,
        v.spatial_merge_size,
    ).astype(params["visual"]["patch_embed"].dtype)
    return stream_frame_step(
        params, cfg, pixels, frame_input_ids, pos_base, t_offset, state,
        grid_thw,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_thw"),
    donate_argnames=("state",),
)
def stream_clip_step(
    params: Params,
    cfg: InfiniteVLConfig,
    pixel_values: jax.Array,  # [n_units * n_patches, in_feat] packed units
    clip_input_ids: jax.Array,  # [1, n_units * (1 + n_tok)]
    pos_base: jax.Array,  # scalar int32
    t_offsets: jax.Array,  # [n_units] int32: temporal offset per unit
    state: DecoderState,
    grid_thw: Tuple[Tuple[int, int, int], ...],  # n_units single-unit grids
) -> DecoderState:
    """Ingest N temporal units in ONE forward (T = N * (1 + n_tok)).

    Token stream, per-unit positions, per-frame ViT windows, and state
    updates are identical to N sequential stream_frame_step calls (each
    unit keeps its own (1, h, w) grid so full-attention ViT blocks never
    mix units — same semantics as the per-frame demo loop). What changes
    is throughput: the decoder's per-step weight read (~7.4 GB at 3B)
    amortizes over N*257 tokens instead of 257, at a latency cost of N-1
    units of buffering on the host."""
    plan = get_vision_plan(grid_thw, cfg.vision)
    vis = vision_forward(params["visual"], cfg.vision, pixel_values, plan)

    embeds = embed_tokens(params["text"], clip_input_ids)
    mask = clip_input_ids == cfg.image_token_id
    embeds = scatter_vision_embeds(embeds, vis, mask)

    n = len(grid_thw)
    per = clip_input_ids.shape[1] // n
    n_tok = per - 1
    m = cfg.vision.spatial_merge_size
    lh, lw = grid_thw[0][1] // m, grid_thw[0][2] // m
    h_idx = jnp.repeat(jnp.arange(lh, dtype=jnp.int32), lw)
    w_idx = jnp.tile(jnp.arange(lw, dtype=jnp.int32), lh)
    grid_base = pos_base + 1
    start_col = jnp.broadcast_to(pos_base, (n, 1)).astype(jnp.int32)
    pos_t = jnp.concatenate(
        [start_col, grid_base + t_offsets[:, None] + jnp.zeros((n, n_tok), jnp.int32)],
        axis=1,
    ).reshape(-1)
    pos_h = jnp.concatenate(
        [start_col, jnp.broadcast_to(grid_base + h_idx, (n, n_tok))], axis=1
    ).reshape(-1)
    pos_w = jnp.concatenate(
        [start_col, jnp.broadcast_to(grid_base + w_idx, (n, n_tok))], axis=1
    ).reshape(-1)
    pos = jnp.stack([pos_t, pos_h, pos_w])[:, None, :]  # [3, 1, T]

    _, state, _ = text_forward(params["text"], cfg.text, embeds, pos, state)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_thw"),
    donate_argnames=("state",),
)
def stream_clip_step_raw(
    params: Params,
    cfg: InfiniteVLConfig,
    raw_frames: jax.Array,  # [n_units, H, W, C] (duplicate mode) or
    #                         [n_units * tps, H, W, C] (consecutive frames)
    clip_input_ids: jax.Array,
    pos_base: jax.Array,
    t_offsets: jax.Array,  # [n_units]
    state: DecoderState,
    grid_thw: Tuple[Tuple[int, int, int], ...],
) -> DecoderState:
    """Raw-uint8 clip variant: normalize+patchify on device. When one frame
    per unit is supplied it is duplicated on device to fill
    temporal_patch_size (the demo's duplicate semantics, 3 B/px shipped)."""
    from .data.processing import patchify_device

    v = cfg.vision
    n = len(grid_thw)
    frames = raw_frames
    if frames.shape[0] == n and v.temporal_patch_size > 1:
        frames = jnp.repeat(frames, v.temporal_patch_size, axis=0)
    # patchify of the whole clip is block-equivalent to per-unit patchify:
    # rows [i*HW : (i+1)*HW] hold unit i's patches (t-major layout)
    pixels = patchify_device(
        frames, v.patch_size, v.temporal_patch_size, v.spatial_merge_size
    ).astype(params["visual"]["patch_embed"].dtype)
    return stream_clip_step(
        params, cfg, pixels, clip_input_ids, pos_base, t_offsets, state,
        grid_thw,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_thw"),
    donate_argnames=("state",),
)
def stream_frames_batched(
    params: Params,
    cfg: InfiniteVLConfig,
    pixel_values: jax.Array,  # [B * n_patches, in_feat] one frame per stream
    frame_input_ids: jax.Array,  # [B, 1 + n_tok]
    pos_base: jax.Array,  # scalar int32 (streams advance in lockstep)
    t_offset: jax.Array,  # scalar int32
    state: DecoderState,  # batch_size B
    grid_thw: Tuple[Tuple[int, int, int], ...],  # B single-frame grids
) -> DecoderState:
    """Ingest one frame for each of B independent streams in ONE forward.

    Multi-camera serving: each stream keeps its own state row; frames pack
    as B per-frame ViT grids (full-attention blocks never mix streams) and
    scatter row-major into each row's pad tokens. Streams advance in
    lockstep (same frame index).

    Measured on one v5e (448x448, 3B): device-side the batched step is
    SLOWER than B sequential steps (B=8: 276 ms vs 8x29.2 — the T=257 step
    is already compute-ridge-bound, so there is no weight-read slack to
    amortize). Use it when per-step dispatch latency dominates (one host
    dispatch + sync for all streams instead of B), or under a multi-chip
    mesh with the batch axis sharded over `data`."""
    plan = get_vision_plan(grid_thw, cfg.vision)
    vis = vision_forward(params["visual"], cfg.vision, pixel_values, plan)

    embeds = embed_tokens(params["text"], frame_input_ids)
    mask = frame_input_ids == cfg.image_token_id
    embeds = scatter_vision_embeds(embeds, vis, mask)

    B, T = frame_input_ids.shape
    n_tok = T - 1
    m = cfg.vision.spatial_merge_size
    lh, lw = grid_thw[0][1] // m, grid_thw[0][2] // m
    h_idx = jnp.repeat(jnp.arange(lh, dtype=jnp.int32), lw)
    w_idx = jnp.tile(jnp.arange(lw, dtype=jnp.int32), lh)
    grid_base = pos_base + 1
    pos_t = jnp.concatenate(
        [pos_base[None], grid_base + t_offset + jnp.zeros(n_tok, jnp.int32)]
    )
    pos_h = jnp.concatenate([pos_base[None], grid_base + h_idx])
    pos_w = jnp.concatenate([pos_base[None], grid_base + w_idx])
    pos = jnp.broadcast_to(
        jnp.stack([pos_t, pos_h, pos_w])[:, None, :], (3, B, T)
    )

    _, state, _ = text_forward(params["text"], cfg.text, embeds, pos, state)
    return state


class StreamingEngine:
    """Frame-by-frame video prefill with branched QA; the functional
    equivalent of the reference demo's main loop (push_frame / ask / stats)."""

    def __init__(
        self,
        params: Params,
        cfg: InfiniteVLConfig,
        frame_hw: Tuple[int, int] = (448, 448),
        dtype=None,
        batch_size: int = 1,
        fuse: bool = False,
    ):
        if dtype is None:
            # state dtype must match the activations' (see Generator); a
            # quantized embed carries its dtype on the scale leaf
            tp = params["text"] if "text" in params else params
            emb = tp["embed"] if "embed" in tp else tp["embed_scale"]
            dtype = emb.dtype
        if fuse:
            # opt-in: one matmul per projection group — measured SLOWER on
            # v5e at these shapes (see models/fuse.py); re-measure before use
            from .models.fuse import fuse_projections

            params = fuse_projections(params)
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        self.frame_hw = tuple(frame_hw)
        p = cfg.vision.patch_size
        mp = p * cfg.vision.spatial_merge_size
        if frame_hw[0] % mp or frame_hw[1] % mp:
            raise ValueError("frame size must be a multiple of patch*merge")
        gh, gw = frame_hw[0] // p, frame_hw[1] // p
        self.grid_thw = ((1, gh, gw),)
        m = cfg.vision.spatial_merge_size
        self.tokens_per_frame = (gh // m) * (gw // m)
        ids = [cfg.vision_start_token_id] + [cfg.image_token_id] * self.tokens_per_frame
        self.frame_input_ids = jnp.asarray([ids], dtype=jnp.int32)
        self.state: DecoderState = init_decoder_state(cfg.text, batch_size, dtype=dtype)
        # host-side position bookkeeping (static per frame index)
        self.pos_base = 0  # position of <vision_start> for stream frames
        self.pos_max = -1  # running max mrope position
        self.frame_times_ms: List[float] = []
        self.frames = 0

    # ------------------------------------------------------------------
    def prime(
        self,
        input_ids: np.ndarray,  # [1, T] initial prompt (may include a frame)
        pixel_values: Optional[np.ndarray] = None,
        image_grid_thw: Optional[np.ndarray] = None,
    ) -> None:
        """Prefill an initial prompt (reference demo's frame-0 template
        prefill, demo:325-347). Sets the stream position base."""
        pos, _ = get_rope_index(self.cfg, input_ids, image_grid_thw)
        grid = (
            tuple(tuple(int(x) for x in g) for g in image_grid_thw)
            if image_grid_thw is not None
            else None
        )
        pv = jnp.asarray(pixel_values, dtype=self.dtype) if pixel_values is not None else None
        _, self.state = prefill(
            self.params,
            self.cfg,
            jnp.asarray(input_ids),
            jnp.asarray(pos),
            self.state,
            pixel_values=pv,
            grid_thw=grid,
        )
        self.pos_max = int(pos.max())
        self.pos_base = self.pos_max + 1

    def t_offset_for_frame(self, frame_idx: int, fps: float) -> int:
        """demo:444-447: grid_t = floor(frame_time / second_per_grid_ts);
        offset in position units = grid_t * second_per_grid * tokens_per_second."""
        v = self.cfg.vision
        second_per_grid = v.temporal_patch_size / fps
        grid_t = int((frame_idx / fps) / second_per_grid)
        return int(grid_t * second_per_grid * v.tokens_per_second)

    def push_frame(self, pixel_values: np.ndarray, fps: float = 30.0) -> None:
        """Ingest one frame (pixel_values: [n_patches, in_feat])."""
        t_off = self.t_offset_for_frame(self.frames, fps)
        t0 = time.perf_counter()
        self.state = stream_frame_step(
            self.params,
            self.cfg,
            jnp.asarray(pixel_values, dtype=self.dtype),
            self.frame_input_ids,
            jnp.asarray(self.pos_base, dtype=jnp.int32),
            jnp.asarray(t_off, dtype=jnp.int32),
            self.state,
            self.grid_thw,
        )
        jax.block_until_ready(self.state)
        self.frame_times_ms.append((time.perf_counter() - t0) * 1e3)
        self.pos_max = max(self.pos_max, self.pos_base + 1 + t_off)
        self.frames += 1

    def push_frame_pair(
        self, pixel_values: np.ndarray, fps: float = 30.0
    ) -> None:
        """Ingest TWO consecutive frames as one temporal unit
        (pixel_values: [n_patches, in_feat] from patchify of a [2, H, W, C]
        clip). The reference demo duplicates each frame to fill
        temporal_patch_size=2 (demo_streaming_inference.py frame loop), which
        doubles tokens per frame of video; pairing real frames matches the
        OFFLINE video processor semantics exactly (one grid_t unit per
        temporal_patch_size frames) and halves per-frame decoder+ViT cost."""
        t_off = self.t_offset_for_frame(self.frames, fps)
        t0 = time.perf_counter()
        self.state = stream_frame_step(
            self.params,
            self.cfg,
            jnp.asarray(pixel_values, dtype=self.dtype),
            self.frame_input_ids,
            jnp.asarray(self.pos_base, dtype=jnp.int32),
            jnp.asarray(t_off, dtype=jnp.int32),
            self.state,
            self.grid_thw,
        )
        jax.block_until_ready(self.state)
        self.frame_times_ms.append((time.perf_counter() - t0) * 1e3)
        self.pos_max = max(self.pos_max, self.pos_base + 1 + t_off)
        self.frames += 2

    def push_frame_raw_paired(self, frame_rgb: np.ndarray, fps: float = 30.0) -> bool:
        """Paired-mode raw ingestion: buffers every other frame on the host
        and runs one step per two frames (normalize+patchify of the [2, H,
        W, C] clip on device). Returns True when a step ran."""
        if not hasattr(self, "_pair_buf"):
            self._pair_buf: List[np.ndarray] = []
        self._pair_buf.append(np.asarray(frame_rgb))
        if len(self._pair_buf) < 2:
            return False
        clip = np.stack(self._pair_buf)
        self._pair_buf = []
        t_off = self.t_offset_for_frame(self.frames, fps)
        t0 = time.perf_counter()
        self.state = stream_frame_step_raw(
            self.params,
            self.cfg,
            jnp.asarray(clip, dtype=jnp.uint8),
            self.frame_input_ids,
            jnp.asarray(self.pos_base, dtype=jnp.int32),
            jnp.asarray(t_off, dtype=jnp.int32),
            self.state,
            self.grid_thw,
        )
        jax.block_until_ready(self.state)
        self.frame_times_ms.append((time.perf_counter() - t0) * 1e3)
        self.pos_max = max(self.pos_max, self.pos_base + 1 + t_off)
        self.frames += 2
        return True

    def push_frame_raw(self, frame_rgb: np.ndarray, fps: float = 30.0) -> None:
        """Ingest a raw uint8 [H, W, C] frame; normalize+patchify on device."""
        t_off = self.t_offset_for_frame(self.frames, fps)
        t0 = time.perf_counter()
        self.state = stream_frame_step_raw(
            self.params,
            self.cfg,
            jnp.asarray(frame_rgb, dtype=jnp.uint8),
            self.frame_input_ids,
            jnp.asarray(self.pos_base, dtype=jnp.int32),
            jnp.asarray(t_off, dtype=jnp.int32),
            self.state,
            self.grid_thw,
        )
        jax.block_until_ready(self.state)
        self.frame_times_ms.append((time.perf_counter() - t0) * 1e3)
        self.pos_max = max(self.pos_max, self.pos_base + 1 + t_off)
        self.frames += 1

    def extract_stream(self, row: int) -> "StreamingEngine":
        """Snapshot one stream of a multi-stream engine as a batch-1 engine.

        The snapshot is a pytree slice of values (no copies of the parent
        buffers are mutated), so ask() on it leaves the multi-stream state
        untouched — the same free-branching property as single-stream QA."""
        # bypass __init__: it would allocate (and immediately discard) a
        # fresh zero state — ~130 MB of device buffers per call at 3B dims
        eng = StreamingEngine.__new__(StreamingEngine)
        eng.__dict__.update(self.__dict__)
        eng.state = jax.tree.map(
            lambda x: x if x.ndim == 0 else x[:, row : row + 1], self.state
        )
        eng.frame_times_ms = []
        return eng

    def push_frames_batched(
        self, pixel_values: np.ndarray, fps: float = 30.0
    ) -> None:
        """Multi-stream ingestion: one frame per stream (pixel_values
        [batch_size * n_patches, in_feat], stream-major), all streams in
        lockstep. Requires the engine to be built with batch_size > 1."""
        B = self.state["delta_h"].shape[1]
        t_off = self.t_offset_for_frame(self.frames, fps)
        t0 = time.perf_counter()
        self.state = stream_frames_batched(
            self.params,
            self.cfg,
            jnp.asarray(pixel_values, dtype=self.dtype),
            jnp.tile(self.frame_input_ids, (B, 1)),
            jnp.asarray(self.pos_base, dtype=jnp.int32),
            jnp.asarray(t_off, dtype=jnp.int32),
            self.state,
            self.grid_thw * B,
        )
        jax.block_until_ready(self.state)
        self.frame_times_ms.append((time.perf_counter() - t0) * 1e3)
        self.pos_max = max(self.pos_max, self.pos_base + 1 + t_off)
        self.frames += 1  # per-stream frame index (lockstep)

    def push_clip_raw(
        self,
        frames: np.ndarray,  # [k, H, W, C] uint8 (duplicate mode) or
        #                      [k * tps, H, W, C] (consecutive-frame mode)
        fps: float = 30.0,
        paired: bool = False,
    ) -> None:
        """Ingest k temporal units in ONE jitted step (stream_clip_step):
        the decoder weight read amortizes over k*257 tokens. Latency grows
        by the k-1 units buffered on the host; per-unit state/position
        semantics match k push_frame calls exactly (tested)."""
        frames = np.asarray(frames)
        tps = self.cfg.vision.temporal_patch_size
        k = frames.shape[0] // tps if paired else frames.shape[0]
        frames_per_unit = tps if paired else 1
        t_offs = [
            self.t_offset_for_frame(self.frames + i * frames_per_unit, fps)
            for i in range(k)
        ]
        clip_ids = jnp.tile(self.frame_input_ids, (1, k))
        t0 = time.perf_counter()
        self.state = stream_clip_step_raw(
            self.params,
            self.cfg,
            jnp.asarray(frames, dtype=jnp.uint8),
            clip_ids,
            jnp.asarray(self.pos_base, dtype=jnp.int32),
            jnp.asarray(t_offs, dtype=jnp.int32),
            self.state,
            self.grid_thw * k,
        )
        jax.block_until_ready(self.state)
        self.frame_times_ms.append((time.perf_counter() - t0) * 1e3)
        self.pos_max = max(self.pos_max, self.pos_base + 1 + max(t_offs))
        self.frames += k * frames_per_unit

    def ask(
        self,
        question_ids: np.ndarray,  # [1, Tq] tokenized question
        max_new_tokens: int = 200,
        eos_token_id: Optional[int] = None,
        chunk_size: int = 16,
    ) -> List[int]:
        """Branch the stream, prefill <vision_end> + question, greedy decode.
        The main stream state is untouched: _qa_prefill does not donate, so
        `branch` is a fresh buffer set; decode chunks then donate the branch
        (still zero copies of the main state). Decoding runs chunk_size
        tokens per jitted program — one host sync per chunk."""
        cfg = self.cfg
        B = self.state["delta_h"].shape[1]
        if B != 1:
            raise ValueError(
                f"ask() branches a single stream; this engine holds {B}. "
                "Use extract_stream(row).ask(...) to question one stream."
            )
        eos = eos_token_id if eos_token_id is not None else cfg.eos_token_id
        q_ids = np.concatenate(
            [[[cfg.vision_end_token_id]], np.atleast_2d(np.asarray(question_ids))],
            axis=1,
        ).astype(np.int32)
        Tq = q_ids.shape[1]
        start = self.pos_max + 1
        pos = np.broadcast_to(
            np.arange(start, start + Tq)[None, None], (3, 1, Tq)
        ).astype(np.int32)
        embeds = embed_tokens(self.params["text"], jnp.asarray(q_ids))
        hidden, branch, _ = _qa_prefill(
            self.params, cfg, embeds, jnp.asarray(pos), self.state
        )
        logits = lm_head(self.params["text"], cfg.text, hidden[:, -1])
        tok = int(jnp.argmax(logits, axis=-1)[0])
        out: List[int] = []
        if tok == eos or max_new_tokens <= 0:
            return out
        out.append(tok)
        # decode positions continue from start+Tq: delta vs branch cum_len
        delta = start - int(self.state["cum_len"])
        rope_delta = jnp.asarray([[delta]], dtype=jnp.int32)
        tok_in = jnp.asarray([[tok]], dtype=jnp.int32)
        finished = jnp.zeros((1,), dtype=bool)
        key = jax.random.PRNGKey(0)  # unused at temperature 0 (greedy)
        while len(out) < max_new_tokens:
            steps = min(chunk_size, max_new_tokens - len(out))
            toks, branch, finished, _ = decode_chunk(
                self.params, cfg, tok_in, rope_delta, branch, finished, key,
                steps=steps, eos=eos, temperature=0.0,
            )
            t = np.asarray(toks)[0]  # one host sync per chunk
            for x in t:
                if x == eos:
                    return out
                out.append(int(x))
            if bool(np.asarray(finished).all()):
                return out
            tok_in = toks[:, -1:]
        return out

    def stats(self) -> Dict[str, float]:
        if not self.frame_times_ms:
            return {}
        arr = np.asarray(self.frame_times_ms[1:] or self.frame_times_ms)
        return {
            "frames": self.frames,
            "avg_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "fps": float(1000.0 / arr.mean()),
            "tokens": int(self.state["cum_len"]),
        }


@functools.partial(jax.jit, static_argnames=("cfg",))
def _qa_prefill(params, cfg, embeds, pos, state):
    return text_forward(params["text"], cfg.text, embeds, pos, state)
