"""OpenAI-client examples against the serving API (serve/api.py).

The reference ships scripts/api_example/{test_toolcall,test_image}.py built
on the `openai` client; that package isn't in this image, so these use
stdlib urllib with the SAME request shapes — any OpenAI client pointed at
http://host:8000/v1 works identically.

Start a server first, e.g.:
  python -m infinitevl_tpu.cli api examples/sft_tiny.yaml

Usage:
  python examples/api_client.py chat      # plain chat turn
  python examples/api_client.py tool      # function-calling round trip
  python examples/api_client.py image     # data-URI image turn
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys
import urllib.request

BASE = os.environ.get("API_BASE", "http://127.0.0.1:8000/v1")
KEY = os.environ.get("API_KEY", "")


def post(path: str, payload: dict) -> dict:
    req = urllib.request.Request(
        f"{BASE}{path}",
        data=json.dumps(payload).encode(),
        headers={
            "Content-Type": "application/json",
            **({"Authorization": f"Bearer {KEY}"} if KEY else {}),
        },
    )
    return json.loads(urllib.request.urlopen(req).read())


def demo_chat():
    res = post("/chat/completions", {
        "model": "infinitevl-tpu",
        "messages": [{"role": "user", "content": "Hello! Who are you?"}],
        "max_tokens": 64,
    })
    print(res["choices"][0]["message"]["content"])


def demo_tool():
    """Function-calling round trip (test_toolcall.py shape): the model
    emits tool_calls, the client executes and feeds the result back."""
    def calculate_gpa(grades, hours):
        score = {"A": 4, "B": 3, "C": 2}
        return round(
            sum(score[g] * h for g, h in zip(grades, hours)) / sum(hours), 2
        )

    tools = [{
        "type": "function",
        "function": {
            "name": "calculate_gpa",
            "description": "Calculate the GPA from grades and credit hours",
            "parameters": {
                "type": "object",
                "properties": {
                    "grades": {"type": "array", "items": {"type": "string"}},
                    "hours": {"type": "array", "items": {"type": "integer"}},
                },
                "required": ["grades", "hours"],
            },
        },
    }]
    messages = [{
        "role": "user",
        "content": "My grades are A, A, B, C with hours 3, 4, 3, 2. GPA?",
    }]
    res = post("/chat/completions", {
        "model": "infinitevl-tpu", "messages": messages, "tools": tools,
    })
    msg = res["choices"][0]["message"]
    print("assistant:", json.dumps(msg, indent=2)[:400])
    if msg.get("tool_calls"):
        call = msg["tool_calls"][0]["function"]
        args = json.loads(call["arguments"])
        result = calculate_gpa(**args)
        messages.append(msg)
        messages.append({"role": "tool", "content": json.dumps({"gpa": result})})
        res = post("/chat/completions", {
            "model": "infinitevl-tpu", "messages": messages, "tools": tools,
        })
        print("final:", res["choices"][0]["message"]["content"])


def demo_image():
    """Image turn via a data: URI (test_image.py shape; this server does
    not fetch remote URLs — encode the image into the request)."""
    import numpy as np
    from PIL import Image

    img = Image.fromarray(
        (np.linspace(0, 255, 56 * 56 * 3) % 255)
        .astype("uint8").reshape(56, 56, 3)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    res = post("/chat/completions", {
        "model": "infinitevl-tpu",
        "messages": [{
            "role": "user",
            "content": [
                {"type": "text", "text": "Describe this image briefly."},
                {"type": "image_url", "image_url": {"url": uri}},
            ],
        }],
        "max_tokens": 64,
    })
    print(res["choices"][0]["message"]["content"])


if __name__ == "__main__":
    {"chat": demo_chat, "tool": demo_tool, "image": demo_image}[
        sys.argv[1] if len(sys.argv) > 1 else "chat"
    ]()
