"""Beam search decoding (reference: `num_beams` generating arg,
src/llamafactory/hparams/generating_args.py:45, served through HF
`generate`'s BeamSearchScorer; beam-aware input expansion at
modeling_infinitevl.py:2221-2314).

TPU split of the work:

- the per-step compute — decode forward over the B*K beam-expanded batch,
  fp32 log-softmax, cumulative-score add, top-2K over the K*V candidate
  grid — is ONE jitted program (`_beam_step`, static beam width), as is
  the state reorder that moves every beam's ring-KV/delta state to its
  parent's slot (`_reorder_state_impl`, a batch-axis gather XLA fuses into
  the next step's reads);
- the candidate bookkeeping — the finished-hypothesis pool, length
  penalty, early stopping — is O(K) python on 2K scalars per step,
  mirroring transformers' BeamSearchScorer.process/finalize semantics
  token-for-token (parity-tested against HF generate on the fixture
  model, tests/test_beam.py).

Beam search is a quality knob, not a throughput path: the host round-trip
per step is the same sync HF pays, and each step still runs the full
weight read once for all K beams.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import InfiniteVLConfig


@functools.partial(
    jax.jit, static_argnames=("cfg", "k2"), donate_argnames=("state",)
)
def _beam_step(params, cfg: InfiniteVLConfig, tokens, rope_delta, state,
               beam_scores, k2: int):
    """One beam-expanded decode step. tokens [B*K, 1], beam_scores [B, K]
    (cumulative sum-logprobs). Returns (top-k2 scores, parent beam ids,
    token ids — each [B, k2]) and the stepped state."""
    from .generation import _decode_step_impl

    logits, state = _decode_step_impl(params, cfg, tokens, rope_delta, state)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B*K, V]
    B, K = beam_scores.shape
    V = lp.shape[-1]
    cand = lp.reshape(B, K, V) + beam_scores[:, :, None]
    scores, idx = jax.lax.top_k(cand.reshape(B, K * V), k2)
    return scores, idx // V, idx % V, state


@functools.partial(jax.jit, donate_argnames=("state",))
def _reorder_state_impl(state, idx):
    """Gather beams to their parents' slots. Every leaf carries batch on
    axis 1 (models/state.init_decoder_state); cum_len is a shared scalar."""
    return {
        k: (v if k == "cum_len" else jnp.take(v, idx, axis=1))
        for k, v in state.items()
    }


class _Hyps:
    """transformers BeamHypotheses mirror (generation/beam_search.py:929-
    1001): at most K finished hypotheses, worst evicted, length-penalized
    scores over GENERATED length (decoder_prompt_len excluded)."""

    def __init__(self, k: int, length_penalty: float, early_stopping,
                 max_gen_len: int):
        self.k = k
        self.lp = length_penalty
        self.es = early_stopping
        self.max_gen_len = max_gen_len
        self.beams = []  # (penalized score, np tokens)
        self.worst = 1e9

    def add(self, tokens: np.ndarray, sum_logprobs: float, generated_len: int):
        score = sum_logprobs / (generated_len**self.lp)
        if len(self.beams) < self.k or score > self.worst:
            self.beams.append((score, tokens))
            if len(self.beams) > self.k:
                i = min(range(len(self.beams)), key=lambda j: self.beams[j][0])
                self.beams.pop(i)
            self.worst = min(s for s, _ in self.beams)

    def is_done(self, best_sum_logprobs: float, gen_len: int) -> bool:
        if len(self.beams) < self.k:
            return False
        if self.es is True:
            return True
        if self.es is False:
            return self.worst >= best_sum_logprobs / (gen_len**self.lp)
        # "never": bound by max_length when the penalty rewards length
        ref_len = self.max_gen_len if self.lp > 0.0 else gen_len
        return self.worst >= best_sum_logprobs / (ref_len**self.lp)

    def best(self) -> np.ndarray:
        return max(self.beams, key=lambda sb: sb[0])[1]


def beam_search(
    gen,  # generation.Generator
    input_ids: np.ndarray,  # [B, T]
    num_beams: int = 4,
    max_new_tokens: int = 128,
    eos_token_id: Optional[int] = None,
    length_penalty: float = 1.0,
    early_stopping=False,
) -> np.ndarray:
    """Greedy beam search, HF semantics (do_sample=False, num_return=1).
    Returns [B, <=max_new_tokens] generated tokens (prompt excluded), rows
    padded with eos. Text-only: the reference's beam path expands pixel
    tensors per beam (modeling_infinitevl.py:2221-2314), but for chat the
    ViT runs once at prefill here, so images would only multiply the
    prefill cost K-fold for identical features — feed multimodal prompts
    through Generator.generate and reserve beams for the text turn."""
    from .generation import prefill, prefill_chunked
    from .models.infinitevl import get_rope_index
    from .models.state import init_decoder_state

    cfg = gen.cfg
    ids = np.asarray(input_ids)
    B, T = ids.shape
    K = int(num_beams)
    if K < 2:
        raise ValueError("num_beams must be >= 2 (use generate for greedy)")
    eos = eos_token_id if eos_token_id is not None else cfg.eos_token_id
    k2 = 2 * K

    pos, deltas = get_rope_index(cfg, ids)
    state = init_decoder_state(cfg.text, B, dtype=gen.dtype)
    if T > gen.prefill_chunk_size:
        logits, state = prefill_chunked(
            gen.params, cfg, jnp.asarray(ids), jnp.asarray(pos), state,
            chunk=gen.prefill_chunk_size,
        )
    else:
        logits, state = prefill(
            gen.params, cfg, jnp.asarray(ids), jnp.asarray(pos), state
        )
    # beam-expand: each prompt's state replicated into K adjacent slots
    rep = np.repeat(np.arange(B), K)
    state = _reorder_state_impl(state, jnp.asarray(rep))
    rope_delta = jnp.asarray(np.repeat(deltas, K, axis=0), jnp.int32)

    lp0 = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    )  # [B, V]
    V = lp0.shape[-1]
    beam_scores = np.full((B, K), -1e9, np.float32)
    beam_scores[:, 0] = 0.0  # HF init: only beam 0 live at step 0

    hyps = [_Hyps(K, length_penalty, early_stopping, max_new_tokens)
            for _ in range(B)]
    done = [False] * B
    seqs = np.zeros((B, K, 0), np.int64)

    def process(b, sc, par, tok, gen_len):
        """BeamSearchScorer.process for one batch row: walk the 2K
        candidates best-first; eos candidates ranked < K finish a
        hypothesis, the rest fill the K running beams."""
        nsc = np.empty(K, np.float32)
        npar = np.empty(K, np.int64)
        ntok = np.empty(K, np.int64)
        j = 0
        for rank in range(k2):
            if int(tok[rank]) == eos:
                if rank >= K:
                    continue
                hyps[b].add(
                    seqs[b, int(par[rank])].copy(), float(sc[rank]), gen_len
                )
            else:
                nsc[j], npar[j], ntok[j] = sc[rank], par[rank], tok[rank]
                j += 1
            if j == K:
                break
        assert j == K, "fewer than K non-eos candidates in top 2K"
        done[b] = done[b] or hyps[b].is_done(float(sc.max()), gen_len)
        return nsc, npar, ntok

    step_tokens = np.zeros((B, K), np.int64)
    for t in range(max_new_tokens):
        if t == 0:
            cand = beam_scores[:, :, None] + lp0[:, None, :]
            flat = cand.reshape(B, K * V)
            idx = np.argpartition(-flat, k2 - 1, axis=1)[:, :k2]
            order = np.argsort(-np.take_along_axis(flat, idx, 1), axis=1)
            idx = np.take_along_axis(idx, order, 1)
            sc_all = np.take_along_axis(flat, idx, 1)
            par_all, tok_all = idx // V, idx % V
        else:
            sc_d, par_d, tok_d, state = _beam_step(
                gen.params, cfg, jnp.asarray(step_tokens.reshape(B * K, 1)),
                rope_delta, state, jnp.asarray(beam_scores), k2,
            )
            sc_all = np.asarray(sc_d)
            par_all = np.asarray(par_d)
            tok_all = np.asarray(tok_d)
        parents = np.zeros((B, K), np.int64)
        for b in range(B):
            if done[b]:
                # HF pads finished rows; freeze their beams instead
                parents[b] = np.arange(K)
                step_tokens[b] = eos
                continue
            nsc, npar, ntok = process(
                b, sc_all[b], par_all[b], tok_all[b], gen_len=t + 1
            )
            beam_scores[b], parents[b], step_tokens[b] = nsc, npar, ntok
        seqs = np.concatenate(
            [
                np.take_along_axis(seqs, parents[:, :, None], axis=1),
                step_tokens[:, :, None],
            ],
            axis=2,
        )
        if all(done):
            break
        if t + 1 < max_new_tokens:
            gidx = (np.arange(B)[:, None] * K + parents).reshape(-1)
            state = _reorder_state_impl(state, jnp.asarray(gidx))

    # finalize (beam_search.py:326-366): top off each unfinished pool with
    # its running beams at full generated length
    for b in range(B):
        if not done[b]:
            for i in range(K):
                hyps[b].add(seqs[b, i], float(beam_scores[b, i]),
                            generated_len=seqs.shape[2])
    best = [hyps[b].best() for b in range(B)]
    L = max(len(x) for x in best)
    out = np.full((B, L), eos, np.int64)
    for b, row in enumerate(best):
        out[b, : len(row)] = row
    return out
