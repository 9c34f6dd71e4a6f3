"""Speculative decoding (speculative.py): lossless greedy equivalence,
prompt-lookup drafting, and state discipline across partial acceptance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.generation import Generator
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.speculative import generate_speculative, prompt_lookup_draft


def test_prompt_lookup_draft():
    ctx = np.array([5, 6, 7, 8, 9, 5, 6, 7], dtype=np.int64)
    # suffix 3-gram (5,6,7) matched at position 0 -> proposes 8, 9, 5
    d = prompt_lookup_draft(ctx, 3, ngram_max=3)
    assert d.tolist() == [8, 9, 5]
    # no match anywhere -> empty
    assert prompt_lookup_draft(np.array([1, 2, 3, 4]), 3).size == 0
    # unigram fallback: last token seen before
    d = prompt_lookup_draft(np.array([9, 1, 2, 9]), 2, ngram_max=3)
    assert d.tolist() == [1, 2]


def test_prompt_lookup_prefers_full_continuation():
    """On periodic text the LATEST n-gram occurrence sits near the tail
    and truncates the draft; the draft must come from an occurrence with
    the full k tokens available (measured 2 -> 8 tok/forward on the bench
    full-acceptance workload)."""
    ctx = np.array([1, 2, 3] * 6, dtype=np.int64)  # suffix (1,2,3) repeats
    d = prompt_lookup_draft(ctx, 7, ngram_max=3)
    assert len(d) == 7
    assert d.tolist() == [1, 2, 3, 1, 2, 3, 1]
    # when NO occurrence has the full continuation, take the longest one
    ctx2 = np.array([7, 8, 4, 5, 7, 8], dtype=np.int64)
    d2 = prompt_lookup_draft(ctx2, 5, ngram_max=2)
    # only occurrence of (7,8) is at 0; continuation truncates at len 4
    assert d2.tolist() == [4, 5, 7, 8]
    # ties on available length resolve to the LATEST occurrence
    ctx3 = np.array([2, 9, 2, 5, 2], dtype=np.int64)
    d3 = prompt_lookup_draft(ctx3, 1, ngram_max=1)
    assert d3.tolist() == [5]  # from ctx3[3], after the ctx3[2] match


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return Generator(params, cfg), cfg


def _greedy_reference(gen, prompt, n):
    return np.asarray(gen.generate(prompt, max_new_tokens=n, eos_token_id=-1))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_speculative_matches_greedy(tiny_gen, seed):
    """Token-for-token losslessness on arbitrary prompts: random-weight
    tiny models emit repetitive argmax text, so prompt lookup fires and
    both full and partial acceptance paths are exercised."""
    gen, cfg = tiny_gen
    r = np.random.RandomState(seed)
    prompt = r.randint(3, cfg.text.vocab_size - 8, (1, 12)).astype(np.int64)
    ref = _greedy_reference(gen, prompt, 24)
    spec = generate_speculative(
        gen, prompt, max_new_tokens=24, draft_k=5, eos_token_id=-1
    )
    assert spec[0].tolist() == ref[0].tolist()


def test_speculative_repetitive_prompt_accepts(tiny_gen):
    """A strongly periodic prompt must produce multi-token acceptance (the
    whole point); verified indirectly by matching greedy output while the
    draft path (not the fallback) runs."""
    gen, cfg = tiny_gen
    period = [11, 12, 13, 14]
    prompt = np.asarray([period * 5], dtype=np.int64)
    drafts = prompt_lookup_draft(prompt[0], 4)
    assert drafts.size > 0  # lookup fires on the prompt itself
    ref = _greedy_reference(gen, prompt, 16)
    spec = generate_speculative(
        gen, prompt, max_new_tokens=16, draft_k=5, eos_token_id=-1
    )
    assert spec[0].tolist() == ref[0].tolist()


def test_spec_stats_accounting(tiny_gen):
    """SpecStats must reconcile with the emitted tokens: every output token
    is attributed to exactly one forward's commit, accepted <= drafted, and
    a periodic prompt yields tokens_per_forward > 1 (the speedup proxy)."""
    from infinitevl_tpu.speculative import SpecStats

    gen, cfg = tiny_gen
    prompt = np.asarray([[11, 12, 13, 14] * 5], dtype=np.int64)
    stats = SpecStats()
    spec = generate_speculative(
        gen, prompt, max_new_tokens=16, draft_k=5, eos_token_id=-1,
        stats=stats,
    )
    # emitted is re-anchored to the returned array at the end of the
    # request (post eos/max_new_tokens trims), minus the prefill argmax
    # token which costs no decode forward
    assert stats.emitted == spec.shape[1] - 1
    assert stats.accepted <= stats.drafted
    assert stats.forwards == stats.windows + stats.fallback_steps + stats.commit_steps
    # random tiny weights emit periodic argmax text -> lookup accepts
    assert stats.windows > 0 and stats.accepted > 0
    assert stats.tokens_per_forward > 1.0
    assert "tok/fwd" in stats.summary()


def test_chat_model_records_spec_stats(tiny_gen):
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.serve.chat import ChatModel

    gen, cfg = tiny_gen
    tok = SimpleTokenizer(config=cfg)
    cm = ChatModel(gen, tok, template="empty", draft_k=5)
    assert cm.last_spec_stats is None
    cm.chat(
        [{"role": "user", "content": "abc abc abc abc abc abc"}],
        max_new_tokens=12,
    )
    st = cm.last_spec_stats
    assert st is not None and st.forwards > 0
    assert st.emitted <= 12


def test_spec_verify_logits_match_decode_steps(tiny_gen):
    """REGRESSION: the K-token verify window must convolve over the cached
    short-conv history exactly like sequential decode steps do. With the
    default conv_carry=False (the reference's zero-history multi-token
    quirk) the window's first W-1 tokens see zero conv taps and the logits
    drift ~0.4 — this prompt caught it (greedy emitted 178, spec emitted
    7). spec_verify forces conv_carry internally."""
    import jax.numpy as jnp
    from infinitevl_tpu.generation import (
        decode_step, prefill, spec_verify,
    )
    from infinitevl_tpu.models.infinitevl import get_rope_index
    from infinitevl_tpu.models.state import init_decoder_state

    gen, cfg = tiny_gen
    ids = np.array([[5, 7, 9, 11, 5, 7, 9, 11, 5, 7]])
    pos, deltas = get_rope_index(cfg, ids)
    state = init_decoder_state(cfg.text, 1, dtype=jnp.float32)
    logits, state = prefill(
        gen.params, cfg, jnp.asarray(ids), jnp.asarray(pos), state
    )
    rd = jnp.asarray(deltas, jnp.int32)
    last = int(jnp.argmax(logits[0]))
    st = jax.tree.map(lambda x: x.copy(), state)
    l1, st = decode_step(gen.params, cfg, jnp.asarray([[last]], jnp.int32), rd, st)
    t1 = int(jnp.argmax(l1[0]))
    l2, _ = decode_step(gen.params, cfg, jnp.asarray([[t1]], jnp.int32), rd, st)
    vlog, _ = spec_verify(
        gen.params, cfg, jnp.asarray([[last, t1]], jnp.int32), rd, state
    )
    np.testing.assert_allclose(np.asarray(vlog[:, 0]), np.asarray(l1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(vlog[:, 1]), np.asarray(l2), atol=2e-4)


@pytest.mark.parametrize("seed", [3, 4])
def test_speculative_matches_greedy_short_period(tiny_gen, seed):
    """More greedy-equivalence coverage on period-4 prompts of length 10
    (the class that exposed the conv-history bug: lookup fires immediately
    and the window straddles the conv tap width)."""
    gen, cfg = tiny_gen
    r = np.random.RandomState(seed)
    period = r.randint(3, cfg.text.vocab_size - 8, 4).tolist()
    prompt = np.asarray([(period * 3)[:10]], dtype=np.int64)
    ref = _greedy_reference(gen, prompt, 20)
    spec = generate_speculative(
        gen, prompt, max_new_tokens=20, draft_k=4, eos_token_id=-1
    )
    assert spec[0].tolist() == ref[0].tolist()


def test_speculative_eos_stops(tiny_gen):
    gen, cfg = tiny_gen
    prompt = np.asarray([[7, 8, 9, 7, 8, 9]], dtype=np.int64)
    ref = _greedy_reference(gen, prompt, 32)
    # pick the 3rd greedy token as a fake EOS: spec must stop there too
    eos = int(ref[0][2])
    spec = generate_speculative(
        gen, prompt, max_new_tokens=32, draft_k=4, eos_token_id=eos
    )
    assert eos in spec[0].tolist()
    stop = spec[0].tolist().index(eos)
    assert spec[0][: stop + 1].tolist() == ref[0][: stop + 1].tolist()


def _mm_prompt(cfg, seed=4):
    """Tiny multimodal prompt: one (1,4,4) image grid + repetitive text
    tail so prompt lookup fires during the continuation."""
    rng = np.random.RandomState(seed)
    grid = np.asarray([[1, 4, 4]])
    in_feat = (
        cfg.vision.in_channels
        * cfg.vision.temporal_patch_size
        * cfg.vision.patch_size**2
    )
    pv = rng.randn(16, in_feat).astype(np.float32)
    ids = np.asarray(
        [
            [3, cfg.vision_start_token_id]
            + [cfg.image_token_id] * 4
            + [cfg.vision_end_token_id, 11, 12, 13, 11, 12, 13, 11, 12]
        ],
        dtype=np.int64,
    )
    return ids, pv, grid


def test_speculative_multimodal_matches_greedy(tiny_gen):
    """Multimodal prompts are first-class in the spec path: prefill runs
    the ViT-scatter pipeline and the continuation is token-for-token equal
    to Generator.generate with the same pixels."""
    gen, cfg = tiny_gen
    ids, pv, grid = _mm_prompt(cfg)
    ref = np.asarray(
        gen.generate(
            ids, pixel_values=pv, image_grid_thw=grid,
            max_new_tokens=20, eos_token_id=-1,
        )
    )
    from infinitevl_tpu.speculative import SpecStats

    stats = SpecStats()
    spec = generate_speculative(
        gen, ids, max_new_tokens=20, draft_k=5, eos_token_id=-1,
        stats=stats, pixel_values=pv, image_grid_thw=grid,
    )
    assert spec[0].tolist() == ref[0].tolist()
    assert stats.forwards > 0


def test_chat_model_spec_routes_multimodal(tiny_gen):
    """ChatModel with draft_k routes IMAGE requests through speculation
    (the text-only gate is gone) and records the request's SpecStats."""
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.serve.chat import ChatModel

    gen, cfg = tiny_gen
    tok = SimpleTokenizer(config=cfg)
    chat = ChatModel(gen, tok, template="empty", draft_k=4)
    chat.processor.min_pixels = 1
    img = (np.random.RandomState(0).rand(28, 28, 3) * 255).astype(np.uint8)
    msgs = [{"role": "user", "content": "<image>" + " what is this?" * 3}]
    out = chat.chat(msgs, images=[img], max_new_tokens=8)
    assert isinstance(out, str)
    assert chat.last_spec_stats is not None
    assert chat.last_spec_stats.forwards > 0


def test_speculative_rejects_batch_and_bad_k(tiny_gen):
    gen, _ = tiny_gen
    with pytest.raises(ValueError):
        generate_speculative(gen, np.zeros((2, 4), np.int64))
    with pytest.raises(ValueError):
        generate_speculative(gen, np.zeros((1, 4), np.int64), draft_k=1)


def test_generator_method_delegates(tiny_gen):
    gen, _ = tiny_gen
    prompt = np.asarray([[5, 6, 5, 6, 5, 6]], dtype=np.int64)
    out = gen.generate_speculative(prompt, max_new_tokens=8, eos_token_id=-1)
    assert out.shape[0] == 1 and out.shape[1] >= 1


def test_chat_model_spec_routing_lossless(tiny_gen):
    """ChatModel(draft_k>0): greedy text-only answers are identical to the
    plain path; sampling / penalty requests fall back to generate()."""
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.serve.chat import ChatModel

    gen, cfg = tiny_gen
    tok = SimpleTokenizer(config=cfg)
    msgs = [{"role": "user", "content": "the cat sat on the mat the cat"}]
    plain = ChatModel(gen, tok).chat(msgs, max_new_tokens=12)
    spec = ChatModel(gen, tok, draft_k=4).chat(msgs, max_new_tokens=12)
    assert spec == plain
    # non-greedy request through the same model exercises the fallback
    sampled = ChatModel(gen, tok, draft_k=4).chat(
        msgs, max_new_tokens=4, temperature=0.8, seed=3
    )
    assert isinstance(sampled, str)


def test_api_backend_spec_routing_lossless(tiny_gen):
    """ChatBackend(draft_k>0): greedy text completion matches the plain
    backend token-for-token (api-level losslessness)."""
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.serve.api import ChatBackend

    gen, cfg = tiny_gen
    tok = SimpleTokenizer(config=cfg)
    msgs = [{"role": "user", "content": "one two three one two three one"}]
    plain = ChatBackend(gen, tok).complete(msgs, max_tokens=12, temperature=0.0)
    spec = ChatBackend(gen, tok, draft_k=4).complete(
        msgs, max_tokens=12, temperature=0.0
    )
    assert spec["text"] == plain["text"]


def test_processed_probs_matches_sample_token_masking():
    """processed_probs must mirror generation.sample_token's temperature /
    top-k / top-p masking exactly: same support, same argmax, and the same
    renormalized values (the losslessness of rejection sampling hinges on
    verifying against THE sampling distribution)."""
    from infinitevl_tpu.generation import sample_token
    from infinitevl_tpu.speculative import processed_probs

    r = np.random.RandomState(3)
    logits = r.randn(64).astype(np.float32) * 2.0
    for temp, tk, tp in ((0.7, 0, 1.0), (1.3, 5, 1.0), (0.9, 0, 0.8),
                         (1.0, 7, 0.9)):
        p = processed_probs(logits, temp, tk, tp)
        # reconstruct the masked logits via sample_token's own code path:
        # greedy over (logits + log-one-hot noise-free) isn't exposed, so
        # check support + values against a direct mirror of its masking
        x = jnp.asarray(logits)[None] / temp
        if tk > 0:
            kth = jnp.sort(x, axis=-1)[:, -tk][:, None]
            x = jnp.where(x < kth, -jnp.inf, x)
        if tp < 1.0:
            sx = jnp.sort(x, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sx, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            ci = jnp.sum(cum < tp, axis=-1, keepdims=True)
            cut = jnp.take_along_axis(sx, ci, axis=-1)
            x = jnp.where(x < cut, -jnp.inf, x)
        want = np.asarray(jax.nn.softmax(x, axis=-1))[0]
        assert (p > 0).tolist() == (want > 0).tolist(), (temp, tk, tp)
        np.testing.assert_allclose(p, want, atol=1e-5)
        # greedy agreement with the real sampler
        g = sample_token(jnp.asarray(logits)[None], temperature=0.0)
        assert int(np.argmax(processed_probs(logits, 1.0, 0, 1.0))) == int(g[0])


def test_sampled_spec_distribution_equality(tiny_gen):
    """Losslessness of rejection-sampled speculation: over many seeds the
    emitted-token distribution at each position matches plain sampling
    (total-variation distance, fixed seeds — deterministic)."""
    from infinitevl_tpu.speculative import generate_speculative_sampled

    gen, cfg = tiny_gen
    period = [11, 12, 13, 14]
    prompt = np.asarray([period * 5], dtype=np.int64)
    # top_k=3 pins each step's support to 3 tokens, so N samples actually
    # estimate the distribution (a raw tiny-model distribution is near-
    # uniform over the 512-token vocab and no sample count converges)
    N, L = 300, 3
    temp, tk = 1.0, 3

    spec_rows = np.stack([
        np.pad(
            generate_speculative_sampled(
                gen, prompt, max_new_tokens=L, draft_k=4,
                temperature=temp, top_k=tk, seed=1000 + s, eos_token_id=-1,
            )[0],
            (0, L),
        )[:L]
        for s in range(N)
    ])
    plain_rows = np.stack([
        np.pad(
            np.asarray(
                gen.generate(
                    prompt, max_new_tokens=L, temperature=temp, top_k=tk,
                    seed=2000 + s, eos_token_id=-1,
                )
            )[0],
            (0, L),
        )[:L]
        for s in range(N)
    ])
    V = cfg.text.vocab_size
    for pos in range(L):
        h_spec = np.bincount(spec_rows[:, pos], minlength=V) / N
        h_plain = np.bincount(plain_rows[:, pos], minlength=V) / N
        tv = 0.5 * np.abs(h_spec - h_plain).sum()
        # two-sample noise floor at N=300 over <=3^(pos+1) support is
        # ~0.1-0.15; a support/renormalization bug reads ~0.5+
        assert tv < 0.25, f"position {pos}: tv={tv:.3f}"
        # support check: spec must never emit outside plain sampling's
        # reachable support (top-k masking respected)
        assert h_spec[h_plain == 0].sum() < 0.06, f"position {pos}"
    # speculation actually fired (not all fallback): periodic prompt
    stats_probe = __import__(
        "infinitevl_tpu.speculative", fromlist=["SpecStats"]
    ).SpecStats()
    generate_speculative_sampled(
        gen, prompt, max_new_tokens=8, draft_k=4, temperature=temp,
        top_k=tk, seed=7, eos_token_id=-1, stats=stats_probe,
    )
    assert stats_probe.windows > 0


def test_sampled_spec_rejects_greedy_and_batch(tiny_gen):
    from infinitevl_tpu.speculative import generate_speculative_sampled

    gen, cfg = tiny_gen
    with pytest.raises(ValueError, match="temperature"):
        generate_speculative_sampled(
            gen, np.ones((1, 4), np.int64), temperature=0.0
        )
    with pytest.raises(ValueError, match="batch-1"):
        generate_speculative_sampled(
            gen, np.ones((2, 4), np.int64), temperature=0.7
        )


def test_chat_routes_sampled_requests_through_spec(tiny_gen):
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.serve.chat import ChatModel

    gen, cfg = tiny_gen
    tok = SimpleTokenizer()
    cm = ChatModel(gen, tok, template="qwen2_vl", draft_k=4)
    cm.chat(
        [{"role": "user", "content": "repeat repeat repeat repeat"}],
        max_new_tokens=8, temperature=0.8,
    )
    assert cm.last_spec_stats is not None
    assert cm.last_spec_stats.forwards > 0


def test_batched_spec_matches_rowwise_greedy(tiny_gen):
    """Synchronized-commit batched speculation is lossless PER ROW: every
    row equals its own greedy decode (min-commit only slows rows down,
    never changes tokens)."""
    from infinitevl_tpu.speculative import generate_speculative_batched

    gen, cfg = tiny_gen
    r = np.random.RandomState(17)
    # one periodic row (high acceptance) + one arbitrary row (low): the min
    # commit must not leak tokens across rows
    rows = [
        ([11, 12, 13, 14] * 3)[:12],
        r.randint(3, cfg.text.vocab_size - 8, 12).tolist(),
    ]
    prompt = np.asarray(rows, dtype=np.int64)
    batched = generate_speculative_batched(
        gen, prompt, max_new_tokens=16, draft_k=5, eos_token_id=-1
    )
    for b in range(2):
        solo = _greedy_reference(gen, prompt[b:b + 1], 16)
        n = min(batched.shape[1], solo.shape[1], 16)
        assert batched[b, :n].tolist() == solo[0, :n].tolist(), b


def test_batched_spec_eos_freezes_row(tiny_gen):
    """A row hitting EOS freezes (pads) while the other row keeps going,
    and neither drags the other's tokens."""
    from infinitevl_tpu.speculative import generate_speculative_batched

    gen, cfg = tiny_gen
    prompt = np.asarray(
        [[7, 8, 9, 7, 8, 9], [11, 12, 13, 11, 12, 13]], dtype=np.int64
    )
    ref0 = _greedy_reference(gen, prompt[:1], 24)
    eos = int(ref0[0][2])  # row 0's 3rd greedy token as fake eos
    batched = generate_speculative_batched(
        gen, prompt, max_new_tokens=24, draft_k=4, eos_token_id=eos
    )
    row0 = batched[0].tolist()
    assert eos in row0
    stop = row0.index(eos)
    assert row0[: stop + 1] == ref0[0][: stop + 1].tolist()
    # tokens after the row's eos are eos padding
    assert all(t == eos for t in row0[stop:])
    ref1 = _greedy_reference(gen, prompt[1:], 24)
    n = min(batched.shape[1], ref1.shape[1], 24)
    # row 1 may legitimately emit the fake-eos token; compare up to its stop
    row1 = batched[1, :n].tolist()
    want1 = ref1[0][:n].tolist()
    if eos in want1:
        k = want1.index(eos)
        assert row1[: k + 1] == want1[: k + 1]
    else:
        assert row1 == want1


def test_batched_spec_stats_accounting(tiny_gen):
    from infinitevl_tpu.speculative import (
        SpecStats,
        generate_speculative_batched,
    )

    gen, cfg = tiny_gen
    prompt = np.asarray([[11, 12, 13, 14] * 4] * 2, dtype=np.int64)
    stats = SpecStats()
    outb = generate_speculative_batched(
        gen, prompt, max_new_tokens=12, draft_k=4, eos_token_id=-1,
        stats=stats,
    )
    assert stats.accepted <= stats.drafted
    assert stats.windows > 0
    # emitted reconciles with what the rows actually contain
    per_row = [
        len(row.tolist()) - 1 for row in outb
    ]
    assert stats.emitted == sum(per_row)
