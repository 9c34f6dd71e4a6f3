"""OpenAI `stop` sequences + `do_sample` + finish_reason mapping.

Reference surface: protocol.py:104 (`stop`), api/chat.py:165/186
(pass-through + Finish mapping), hf_engine.py:135-136 (the reference's hf
engine only WARNS stop is unsupported — here it works, both one-shot and
streamed with split-across-chunks hold-back)."""

import numpy as np
import pytest

from infinitevl_tpu.serve.api import (
    ChatBackend,
    _chat_response,
    _normalize_stop,
    _truncate_at_stop,
)


class WordTok:
    """Whitespace word tokenizer (ids assigned on first sight)."""

    def __init__(self):
        self.vocab = {}
        self.rev = {}

    def encode(self, text, add_special_tokens=False):
        ids = []
        for w in text.split(" "):
            if w not in self.vocab:
                i = len(self.vocab) + 3
                self.vocab[w] = i
                self.rev[i] = w
            ids.append(self.vocab[w])
        return ids

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(self.rev.get(int(i), "?") for i in ids)


def make_backend(reply_words, chunks=None):
    """Backend over a stub generator that replies with fixed words.
    `chunks` splits the reply for generate_stream (chunked delivery)."""
    tok = WordTok()
    reply_ids = tok.encode(reply_words)

    class StubGen:
        class cfg:
            eos_token_id = 2

        def generate(self, ids, **kw):
            b = ids.shape[0]
            return np.asarray([reply_ids] * b)

        def generate_stream(self, ids, **kw):
            bounds = chunks or [len(reply_ids)]
            at = 0
            for c in bounds:
                yield np.asarray([reply_ids[at:at + c]])
                at += c

    return ChatBackend(StubGen(), tok, model_name="stub"), tok


def test_normalize_and_truncate_helpers():
    assert _normalize_stop(None) == []
    assert _normalize_stop("END") == ["END"]
    assert _normalize_stop(["a", "", "b"]) == ["a", "b"]
    with pytest.raises(ValueError):
        _normalize_stop(7)
    assert _truncate_at_stop("one two END three", ["END"]) == ("one two ", True)
    # earliest of several stops wins
    assert _truncate_at_stop("x B y A z", ["A", "B"]) == ("x ", True)
    assert _truncate_at_stop("clean", ["END"]) == ("clean", False)


def test_complete_stop_truncates_and_sets_finish():
    backend, _ = make_backend("alpha beta STOPWORD gamma")
    res = backend.complete(
        [{"role": "user", "content": "hi"}], max_tokens=8, stop="STOPWORD"
    )
    assert res["text"] == "alpha beta "
    assert res["finish_reasons"] == ["stop"]
    # no stop hit and no EOS in the stub reply -> length
    res2 = backend.complete(
        [{"role": "user", "content": "hi"}], max_tokens=8, stop="ABSENT"
    )
    assert res2["text"] == "alpha beta STOPWORD gamma"
    assert res2["finish_reasons"] == ["length"]


def test_chat_response_finish_reason_surfaces():
    backend, _ = make_backend("alpha beta STOPWORD gamma")
    res = _chat_response(
        backend,
        {
            "messages": [{"role": "user", "content": "hi"}],
            "stop": ["STOPWORD"],
        },
    )
    c = res["choices"][0]
    assert c["message"]["content"] == "alpha beta "
    assert c["finish_reason"] == "stop"
    res2 = _chat_response(
        backend, {"messages": [{"role": "user", "content": "hi"}]}
    )
    assert res2["choices"][0]["finish_reason"] == "length"


def test_stream_stop_holdback_across_chunks():
    """A stop string split across two decode chunks must never be
    partially emitted."""
    backend, _ = make_backend(
        "alpha beta STOP WORD gamma delta", chunks=[3, 3]
    )
    # stop spans the chunk boundary ("STOP WORD": token 3 is chunk-1 final,
    # token 4 opens chunk 2)
    pieces = list(
        backend.complete_stream(
            [{"role": "user", "content": "hi"}],
            max_tokens=8,
            stop="STOP WORD",
        )
    )
    assert "".join(pieces) == "alpha beta "
    # nothing ever emitted past the stop, even transiently
    acc = ""
    for p in pieces:
        acc += p
        assert "STOP" not in acc or not acc.endswith("WORD")
    # without stop: everything arrives
    all_pieces = list(
        backend.complete_stream(
            [{"role": "user", "content": "hi"}], max_tokens=8
        )
    )
    assert "".join(all_pieces) == "alpha beta STOP WORD gamma delta"


def test_do_sample_false_forces_greedy():
    """do_sample=False must force temperature 0 (reference
    hf_engine.py:163-166); observed through the kwargs the stub sees."""
    seen = {}
    tok = WordTok()
    reply_ids = tok.encode("one two")

    class SpyGen:
        class cfg:
            eos_token_id = 2

        def generate(self, ids, **kw):
            seen.update(kw)
            return np.asarray([reply_ids] * ids.shape[0])

    backend = ChatBackend(SpyGen(), tok, model_name="stub")
    backend.complete(
        [{"role": "user", "content": "hi"}],
        temperature=0.9,
        do_sample=False,
    )
    assert seen["temperature"] == 0.0
    # but n>1 overrides do_sample=False back to sampled (reference
    # precedence: hf_engine.py:158-161 runs after the do_sample update)
    backend.complete(
        [{"role": "user", "content": "hi"}],
        temperature=0.0,
        do_sample=False,
        n=2,
    )
    assert seen["temperature"] == 1.0
