"""Tool-calling template support (reference data/tool_utils.py QwenToolUtils
+ qwen template format_observation, template.py:1344-1355)."""

import json

import numpy as np

from infinitevl_tpu.data.loader import SimpleTokenizer
from infinitevl_tpu.data.template import (
    extract_tool_calls,
    format_function_calls,
    format_tools,
    get_template,
)

TOOLS = [
    {
        "name": "get_weather",
        "description": "Get the weather for a city",
        "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"}},
            "required": ["city"],
        },
    }
]


def test_format_tools_block():
    block = format_tools(TOOLS)
    assert "<tools>" in block and "</tools>" in block
    assert '"type": "function"' in block
    assert "get_weather" in block


def test_render_prompt_with_tools_and_observation():
    t = get_template("qwen2_vl")
    messages = [
        {"role": "user", "content": "Weather in Paris?"},
        {
            "role": "assistant",
            "content": "",
            "tool_calls": [
                {"function": {"name": "get_weather", "arguments": {"city": "Paris"}}}
            ],
        },
        {"role": "tool", "content": '{"temp_c": 18}'},
    ]
    prompt = t.render_prompt(messages, tools=TOOLS)
    assert "<tools>" in prompt  # signatures injected into the system turn
    assert "<tool_call>" in prompt and '"city": "Paris"' in prompt
    assert "<tool_response>" in prompt  # observation wrapped, user side
    assert prompt.rstrip().endswith("assistant")


def test_encode_turns_supervises_tool_calls_only():
    t = get_template("qwen2_vl")
    tok = SimpleTokenizer()
    messages = [
        {"role": "user", "content": "Weather in Paris?"},
        {
            "role": "assistant",
            "content": "",
            "tool_calls": [
                {"function": {"name": "get_weather", "arguments": {"city": "Paris"}}}
            ],
        },
        {"role": "tool", "content": "18C"},
        {"role": "assistant", "content": "It is 18C in Paris."},
    ]
    ids, labels = t.encode_turns(tok, messages, tools=TOOLS)
    assert len(ids) == len(labels)
    sup = [i for i, l in zip(ids, labels) if l != -100]
    txt = tok.decode(sup)
    assert "tool_call" in txt.replace("<", " ").replace(">", " ")
    assert "18C" in txt  # final answer supervised
    # the tool RESPONSE tokens are not supervised
    resp_ids = tok.encode("<tool_response>", add_special_tokens=False)
    for i, l in zip(ids, labels):
        if i in resp_ids:
            assert l == -100


def test_extract_tool_calls_roundtrip():
    calls = [{"name": "get_weather", "arguments": {"city": "Tokyo"}}]
    text = format_function_calls(calls)
    out = extract_tool_calls(text)
    assert out == calls
    # parallel calls
    two = format_function_calls(calls * 2)
    assert len(extract_tool_calls(two)) == 2
    # plain text passes through unchanged
    assert extract_tool_calls("just words") == "just words"
    assert extract_tool_calls("<tool_call>not json</tool_call>") == (
        "<tool_call>not json</tool_call>"
    )


def test_ollama_modelfile():
    from infinitevl_tpu.data.template import get_ollama_modelfile

    t = get_template("qwen2_vl")
    mf = get_ollama_modelfile(t)
    assert mf.startswith("# ollama modelfile")
    assert 'FROM .' in mf and "TEMPLATE" in mf
    assert "{{ .System }}" in mf and "{{ .Content }}" in mf
    assert 'PARAMETER stop "<|im_end|>"' in mf
    assert "PARAMETER num_ctx 4096" in mf


def test_api_tool_calls_roundtrip():
    """OpenAI-style tools through the API layer (reference smoke:
    scripts/api_example/test_toolcall.py): signatures render into the
    prompt, <tool_call> output parses to message.tool_calls."""
    import json as _json

    import numpy as np

    from infinitevl_tpu.serve.api import ChatBackend, _chat_response

    class WordTok:
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

    tok = WordTok()
    reply = '<tool_call> {"name": "get_weather", "arguments": {"city": "Paris"}} </tool_call>'
    reply_ids = tok.encode(reply)

    class StubGen:
        class cfg:
            eos_token_id = 2

        def generate(self, ids, **kw):
            return np.asarray([reply_ids])

    backend = ChatBackend(StubGen(), tok, model_name="stub")
    req = {
        "messages": [{"role": "user", "content": "Weather in Paris?"}],
        "tools": [{"type": "function", "function": TOOLS[0]}],
        "max_tokens": 16,
    }
    res = _chat_response(backend, req)
    choice = res["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    calls = choice["message"]["tool_calls"]
    assert calls[0]["function"]["name"] == "get_weather"
    assert _json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}
    # the prompt really contained the tool signatures
    assert any("<tools>" in w for w in tok.vocab)
