"""n>1 completions (OpenAI `n` / num_return_sequences) through ChatModel,
ChatBackend, and the /v1/chat/completions choices array.

Reference surface: protocol.py:102 (`n: int = 1`), api/chat.py:164
(num_return_sequences=request.n), hf_engine.py:158-161 (n>1 forces
sampling, temperature or 1.0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinitevl_tpu import tiny_config
from infinitevl_tpu.data.loader import SimpleTokenizer
from infinitevl_tpu.generation import Generator
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.serve.api import ChatBackend, _chat_response
from infinitevl_tpu.serve.chat import ChatModel


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return Generator(params, cfg, dtype=jnp.float32), cfg


def test_chat_model_n_returns_list(tiny_gen):
    gen, cfg = tiny_gen
    chat = ChatModel(gen, SimpleTokenizer(config=cfg))
    msgs = [{"role": "user", "content": "hello there"}]
    outs = chat.chat(msgs, max_new_tokens=8, num_return_sequences=3)
    assert isinstance(outs, list) and len(outs) == 3
    assert all(isinstance(t, str) for t in outs)
    # temperature 0 was force-bumped to sampling: with a 512-vocab random
    # model and 8 sampled tokens, identical rows mean broken tiling
    assert len(set(outs)) > 1
    # deterministic under a fixed seed
    outs2 = chat.chat(msgs, max_new_tokens=8, num_return_sequences=3)
    assert outs == outs2
    # n=1 keeps the plain-string contract
    one = chat.chat(msgs, max_new_tokens=4)
    assert isinstance(one, str)


def test_chat_model_n_refuses_beams(tiny_gen):
    gen, cfg = tiny_gen
    chat = ChatModel(gen, SimpleTokenizer(config=cfg))
    with pytest.raises(ValueError, match="beam"):
        chat.chat(
            [{"role": "user", "content": "hi"}],
            num_return_sequences=2,
            num_beams=2,
        )


def test_backend_complete_n(tiny_gen):
    gen, cfg = tiny_gen
    backend = ChatBackend(gen, SimpleTokenizer(config=cfg), model_name="tiny")
    res = backend.complete(
        [{"role": "user", "content": "hello world"}], max_tokens=8, n=3
    )
    assert len(res["texts"]) == 3
    assert res["text"] == res["texts"][0]
    assert res["completion_tokens"] >= 3  # summed across rows
    with pytest.raises(ValueError, match="n must be"):
        backend.complete([{"role": "user", "content": "x"}], n=0)


def test_chat_response_builds_n_choices(tiny_gen):
    gen, cfg = tiny_gen
    backend = ChatBackend(gen, SimpleTokenizer(config=cfg), model_name="tiny")
    res = _chat_response(
        backend,
        {
            "messages": [{"role": "user", "content": "hello world"}],
            "max_tokens": 6,
            "n": 3,
        },
    )
    choices = res["choices"]
    assert [c["index"] for c in choices] == [0, 1, 2]
    assert all(c["message"]["role"] == "assistant" for c in choices)
    assert all(c["finish_reason"] in ("stop", "length") for c in choices)
    # n omitted -> single choice (unchanged contract)
    res1 = _chat_response(
        backend,
        {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 4},
    )
    assert len(res1["choices"]) == 1
