"""Chat template engine.

Minimal, tokenizer-agnostic re-design of the reference's template registry
(src/llamafactory/data/template.py:40-1575): a template renders a message
list into prompt/response strings with the family's control tokens, and
`encode_turns` produces (input_ids, labels) with non-assistant tokens masked
to IGNORE_INDEX. Registered families: qwen2_vl/qwen/chatml, llama3/llama2,
gemma, phi/phi4, mistral(+small), deepseek(+3), glm4, yi, zephyr, vicuna,
alpaca, baichuan2, default/fewshot/empty; the registry is open for more.

Tool calling follows the Qwen 2.5 convention the reference implements in
data/tool_utils.py (QwenToolUtils): tool signatures go into the system turn
inside <tools></tools>, assistant function calls render as
<tool_call>{json}</tool_call>, and tool results come back as a "tool" role
wrapped in <tool_response></tool_response>.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

IGNORE_INDEX = -100

# QWEN_TOOL_PROMPT / function format (reference tool_utils.py:52-57, 270-292)
TOOL_PROMPT = (
    "\n\n# Tools\n\nYou may call one or more functions to assist with the "
    "user query.\n\nYou are provided with function signatures within "
    "<tools></tools> XML tags:\n<tools>{tool_text}\n</tools>\n\nFor each "
    "function call, return a json object with function name and arguments "
    'within <tool_call></tool_call> XML tags:\n<tool_call>\n{{"name": '
    '<function-name>, "arguments": <args-json-object>}}\n</tool_call>'
)


def format_tools(tools: Sequence[Dict[str, Any]]) -> str:
    """System-prompt tool block (QwenToolUtils.tool_formatter)."""
    tool_text = "".join(
        "\n" + json.dumps({"type": "function", "function": t}, ensure_ascii=False)
        for t in tools
    )
    return TOOL_PROMPT.format(tool_text=tool_text)


def format_function_calls(calls: Sequence[Dict[str, Any]]) -> str:
    """Assistant-side rendering of function calls
    (QwenToolUtils.function_formatter)."""
    parts = []
    for c in calls:
        args = c.get("arguments", {})
        if not isinstance(args, str):
            args = json.dumps(args, ensure_ascii=False)
        parts.append(
            "<tool_call>\n"
            + json.dumps({"name": c["name"], "arguments": json.loads(args)},
                         ensure_ascii=False)
            + "\n</tool_call>"
        )
    return "\n".join(parts)


_TOOL_CALL_RE = re.compile(
    r"<tool_call>(.+?)</tool_call>(?=\s*<tool_call>|\s*$)", re.DOTALL
)


def extract_tool_calls(content: str):
    """Parse <tool_call> blocks out of a generated completion
    (QwenToolUtils.tool_extractor). Returns the raw string when no valid
    calls are present, else a list of {"name", "arguments"} dicts."""
    matches = _TOOL_CALL_RE.findall(content)
    if not matches:
        return content
    out = []
    for m in matches:
        try:
            d = json.loads(m.strip())
        except json.JSONDecodeError:
            return content
        if "name" not in d:
            return content
        out.append({"name": d["name"], "arguments": d.get("arguments", {})})
    return out


@dataclasses.dataclass(frozen=True)
class Template:
    name: str
    system_prefix: str  # format with {content}
    user_prefix: str
    assistant_prefix: str
    turn_suffix: str
    default_system: str = ""
    stop_words: Tuple[str, ...] = ()
    # emitted once before the first turn (reference format_prefix, e.g.
    # llama3's <|begin_of_text|>)
    prefix: str = ""
    # per-role suffix overrides; None falls back to turn_suffix. Needed for
    # the reference's slot-based templates where e.g. gemma's system turn
    # ends in "\n\n" but its chat turns end in "<end_of_turn>\n".
    system_suffix: Optional[str] = None
    user_suffix: Optional[str] = None
    # Llama2Template semantics (reference template.py:365-395): the system
    # text renders INSIDE the first user turn (prepended to its content)
    # instead of as its own turn.
    system_inline: bool = False

    def _suffix(self, role: str) -> str:
        if role == "system" and self.system_suffix is not None:
            return self.system_suffix
        if role == "user" and self.user_suffix is not None:
            return self.user_suffix
        return self.turn_suffix

    def _prepare(
        self,
        messages: Sequence[Dict[str, Any]],
        tools: Optional[Sequence[Dict[str, Any]]] = None,
    ) -> List[Dict[str, str]]:
        """Normalize roles and inject tools: tool signatures append to the
        system turn (reference ToolFormatter placement); "tool"/"observation"
        turns wrap in <tool_response> as a user-side turn (reference qwen
        format_observation, template.py:1349-1351); assistant messages with
        `tool_calls` render them as <tool_call> blocks."""
        msgs: List[Dict[str, str]] = []
        has_system = any(m["role"] == "system" for m in messages)
        if not has_system and (self.default_system or tools):
            msgs.append({"role": "system", "content": self.default_system})
        for m in messages:
            role, content = m["role"], m.get("content", "")
            if role in ("tool", "observation", "function"):
                msgs.append(
                    {
                        "role": "user",
                        "content": f"<tool_response>\n{content}\n</tool_response>",
                    }
                )
                continue
            if role == "assistant" and m.get("tool_calls"):
                rendered = format_function_calls(
                    [
                        c.get("function", c)
                        for c in m["tool_calls"]
                    ]
                )
                content = (content + "\n" + rendered).strip()
            msgs.append({"role": role, "content": content})
        if tools:
            msgs[0] = {
                "role": "system",
                "content": msgs[0]["content"] + format_tools(tools),
            }
        if self.system_inline and msgs and msgs[0]["role"] == "system":
            sys_text = self.system_prefix.format(content=msgs[0]["content"])
            msgs = msgs[1:]
            for m in msgs:
                if m["role"] == "user":
                    m["content"] = sys_text + m["content"]
                    break
        return msgs

    def render_prompt(
        self,
        messages: Sequence[Dict[str, Any]],
        add_generation_prompt: bool = True,
        tools: Optional[Sequence[Dict[str, Any]]] = None,
    ) -> str:
        """messages: [{role: system|user|assistant|tool, content: str}, ...]."""
        out = [self.prefix] if self.prefix else []
        for m in self._prepare(messages, tools):
            role, content = m["role"], m["content"]
            if role == "system":
                out.append(self.system_prefix.format(content=content))
            elif role == "user":
                out.append(self.user_prefix.format(content=content))
            elif role == "assistant":
                out.append(self.assistant_prefix + content)
            else:
                raise ValueError(f"unknown role {role!r}")
            out.append(self._suffix(role))
        if add_generation_prompt:
            out.append(self.assistant_prefix)
        return "".join(out)

    def encode_turns(
        self,
        tokenizer,
        messages: Sequence[Dict[str, Any]],
        tools: Optional[Sequence[Dict[str, Any]]] = None,
    ) -> Tuple[List[int], List[int]]:
        """(input_ids, labels): labels = ids on assistant contents (+ the
        turn suffix), IGNORE_INDEX elsewhere — supervised SFT encoding
        (data/processor/supervised.py semantics). Tool responses encode as
        unsupervised user-side turns; assistant tool_calls are supervised."""
        ids: List[int] = []
        labels: List[int] = []
        if self.prefix:
            t = tokenizer.encode(self.prefix, add_special_tokens=False)
            ids += t
            labels += [IGNORE_INDEX] * len(t)
        for m in self._prepare(messages, tools):
            role, content = m["role"], m["content"]
            if role == "assistant":
                prefix = tokenizer.encode(self.assistant_prefix, add_special_tokens=False)
                body = tokenizer.encode(content + self.turn_suffix, add_special_tokens=False)
                ids += prefix + body
                labels += [IGNORE_INDEX] * len(prefix) + body
            else:
                fmt = self.system_prefix if role == "system" else self.user_prefix
                seg = fmt.format(content=content) + self._suffix(role)
                t = tokenizer.encode(seg, add_special_tokens=False)
                ids += t
                labels += [IGNORE_INDEX] * len(t)
        return ids, labels


def get_ollama_modelfile(
    template: "Template", num_ctx: int = 4096
) -> str:
    """Ollama Modelfile for this chat template (reference
    template.py:292-307 get_ollama_modelfile): a go-template over .System /
    .Messages plus stop words. Written next to an exported checkpoint so
    `ollama create` can serve it."""
    t = template
    go = (
        "{{ if .System }}"
        + t.system_prefix.format(content="{{ .System }}")
        + t.turn_suffix
        + "{{ end }}"
        + "{{ range .Messages }}{{ if eq .Role \"user\" }}"
        + t.user_prefix.format(content="{{ .Content }}")
        + t.turn_suffix
        + "{{ else if eq .Role \"assistant\" }}"
        + t.assistant_prefix
        + "{{ .Content }}"
        + t.turn_suffix
        + "{{ end }}{{ end }}"
        + t.assistant_prefix
    )
    out = "# ollama modelfile auto-generated by infinitevl_tpu\n\n"
    out += f'FROM .\n\nTEMPLATE """{go}"""\n\n'
    if t.default_system:
        out += f'SYSTEM """{t.default_system}"""\n\n'
    for stop in t.stop_words:
        out += f'PARAMETER stop "{stop}"\n'
    out += f"PARAMETER num_ctx {num_ctx}\n"
    return out


_TEMPLATES: Dict[str, Template] = {}


def register_template(t: Template) -> None:
    _TEMPLATES[t.name] = t


def get_template(name: str) -> Template:
    if name not in _TEMPLATES:
        raise KeyError(
            f"unknown template {name!r}; available: {sorted(_TEMPLATES)}"
        )
    return _TEMPLATES[name]


register_template(
    Template(
        name="qwen2_vl",
        system_prefix="<|im_start|>system\n{content}<|im_end|>",
        user_prefix="<|im_start|>user\n{content}<|im_end|>",
        assistant_prefix="\n<|im_start|>assistant\n",
        turn_suffix="\n",
        default_system="You are a helpful assistant.",
        stop_words=("<|im_end|>",),
    )
)

register_template(
    Template(
        name="chatml",
        system_prefix="<|im_start|>system\n{content}<|im_end|>",
        user_prefix="<|im_start|>user\n{content}<|im_end|>",
        assistant_prefix="\n<|im_start|>assistant\n",
        turn_suffix="\n",
        stop_words=("<|im_end|>",),
    )
)

register_template(
    Template(
        name="empty",
        system_prefix="{content}",
        user_prefix="{content}",
        assistant_prefix="",
        turn_suffix="",
    )
)

# text-only qwen (reference template.py "qwen": identical chatml control
# tokens, same default system as qwen2_vl)
register_template(
    Template(
        name="qwen",
        system_prefix="<|im_start|>system\n{content}<|im_end|>",
        user_prefix="<|im_start|>user\n{content}<|im_end|>",
        assistant_prefix="\n<|im_start|>assistant\n",
        turn_suffix="\n",
        default_system="You are a helpful assistant.",
        stop_words=("<|im_end|>",),
    )
)

# llama3 family (reference template.py "llama3": header tokens per turn,
# <|eot_id|> terminator, <|begin_of_text|> prompt prefix)
register_template(
    Template(
        name="llama3",
        system_prefix="<|start_header_id|>system<|end_header_id|>\n\n{content}",
        user_prefix="<|start_header_id|>user<|end_header_id|>\n\n{content}",
        assistant_prefix="<|start_header_id|>assistant<|end_header_id|>\n\n",
        turn_suffix="<|eot_id|>",
        stop_words=("<|eot_id|>",),
        prefix="<|begin_of_text|>",
    )
)

# ---------------------------------------------------------------------------
# High-traffic template registrations mirroring the reference's registry
# (src/llamafactory/data/template.py, cited per entry). Token-literal slots
# are the models' published chat formats (unavoidable-similarity category).
# BOS/EOS literals are written as the models' published token strings; the
# tokenizer maps them to the special ids.
# ---------------------------------------------------------------------------

# reference template.py:819 (gemma/gemma2; :834 gemma3 is a copy)
for _name in ("gemma", "gemma3"):
    register_template(
        Template(
            name=_name,
            system_prefix="{content}",
            system_suffix="\n\n",
            user_prefix="<start_of_turn>user\n{content}",
            user_suffix="<end_of_turn>\n",
            assistant_prefix="<start_of_turn>model\n",
            turn_suffix="<end_of_turn>\n",
            prefix="<bos>",
            stop_words=("<end_of_turn>",),
        )
    )

# reference template.py:1299 (phi-3)
register_template(
    Template(
        name="phi",
        system_prefix="<|system|>\n{content}",
        user_prefix="<|user|>\n{content}",
        assistant_prefix="<|assistant|>\n",
        turn_suffix="<|end|>\n",
        stop_words=("<|end|>",),
    )
)

# reference template.py:1318 (phi-4)
register_template(
    Template(
        name="phi4",
        system_prefix="<|im_start|>system<|im_sep|>{content}",
        user_prefix="<|im_start|>user<|im_sep|>{content}",
        assistant_prefix="<|im_start|>assistant<|im_sep|>",
        turn_suffix="<|im_end|>",
        stop_words=("<|im_end|>",),
    )
)

# reference template.py:1202 (mistral v3+, Llama2Template: system inlines
# into the first user turn)
register_template(
    Template(
        name="mistral",
        system_prefix="{content}\n\n",
        system_inline=True,
        user_prefix="[INST] {content}[/INST]",
        user_suffix="",
        assistant_prefix=" ",
        turn_suffix="</s>",
        prefix="<s>",
    )
)

# reference template.py:1216 (mistral_small / ministral tekken v7)
register_template(
    Template(
        name="mistral_small",
        system_prefix="[SYSTEM_PROMPT]{content}[/SYSTEM_PROMPT]",
        system_suffix="",
        user_prefix="[INST]{content}[/INST]",
        user_suffix="",
        assistant_prefix="",
        turn_suffix="</s>",
        prefix="<s>",
    )
)

# reference template.py:927/:936 (llama2 family, system inside first [INST])
for _name, _sys in (
    ("llama2", ""),
    ("llama2_zh", "You are a helpful assistant. 你是一个乐于助人的助手。"),
):
    register_template(
        Template(
            name=_name,
            system_prefix="<<SYS>>\n{content}\n<</SYS>>\n\n",
            system_inline=True,
            user_prefix="<s>[INST] {content} [/INST]",
            user_suffix="",
            assistant_prefix=" ",
            turn_suffix="</s>",
            default_system=_sys,
        )
    )

# reference template.py:750 / :758
register_template(
    Template(
        name="deepseek",
        system_prefix="{content}",
        system_suffix="\n\n",
        user_prefix="User: {content}",
        user_suffix="\n\n",
        assistant_prefix="Assistant:",
        turn_suffix="<｜end▁of▁sentence｜>",
        prefix="<｜begin▁of▁sentence｜>",
    )
)
register_template(
    Template(
        name="deepseek3",
        system_prefix="{content}",
        system_suffix="",
        user_prefix="<｜User｜>{content}",
        user_suffix="",
        assistant_prefix="<｜Assistant｜>",
        turn_suffix="<｜end▁of▁sentence｜>",
        prefix="<｜begin▁of▁sentence｜>",
    )
)

# reference template.py:849 (glm4; efficient_eos — no eos between turns)
register_template(
    Template(
        name="glm4",
        system_prefix="<|system|>\n{content}",
        system_suffix="",
        user_prefix="<|user|>\n{content}",
        user_suffix="",
        assistant_prefix="<|assistant|>\n",
        turn_suffix="",
        prefix="[gMASK]<sop>",
        stop_words=("<|user|>", "<|observation|>"),
    )
)

# reference template.py:1530 (yi: chatml control tokens, no default system)
register_template(
    Template(
        name="yi",
        system_prefix="<|im_start|>system\n{content}<|im_end|>",
        user_prefix="<|im_start|>user\n{content}<|im_end|>",
        assistant_prefix="\n<|im_start|>assistant\n",
        turn_suffix="\n",
        stop_words=("<|im_end|>",),
    )
)

# reference template.py:1564 (zephyr)
register_template(
    Template(
        name="zephyr",
        system_prefix="<|system|>\n{content}</s>",
        system_suffix="",
        user_prefix="<|user|>\n{content}</s>",
        user_suffix="",
        assistant_prefix="<|assistant|>\n",
        turn_suffix="</s>",
        default_system="You are Zephyr, a helpful assistant.",
    )
)

# reference template.py:1470 (vicuna)
register_template(
    Template(
        name="vicuna",
        system_prefix="{content} ",
        system_suffix="",
        user_prefix="USER: {content} ",
        user_suffix="",
        assistant_prefix="ASSISTANT:",
        turn_suffix="</s>",
        default_system=(
            "A chat between a curious user and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the user's questions."
        ),
    )
)

# reference template.py:539 (alpaca)
register_template(
    Template(
        name="alpaca",
        system_prefix="{content}",
        system_suffix="\n\n",
        user_prefix="### Instruction:\n{content}\n\n",
        user_suffix="",
        assistant_prefix="### Response:\n",
        turn_suffix="\n\n",
        default_system=(
            "Below is an instruction that describes a task. Write a response "
            "that appropriately completes the request.\n\n"
        ),
    )
)

# reference template.py:779 (default)
register_template(
    Template(
        name="default",
        system_prefix="System: {content}",
        user_prefix="Human: {content}",
        assistant_prefix="Assistant: ",
        turn_suffix="\n",
    )
)

# reference template.py:579 (baichuan2; reserved control tokens)
register_template(
    Template(
        name="baichuan2",
        system_prefix="{content}",
        system_suffix="",
        user_prefix="<reserved_106>{content}",
        user_suffix="",
        assistant_prefix="<reserved_107>",
        turn_suffix="",
    )
)

# reference template.py:811 (fewshot: bare completion format used by eval)
register_template(
    Template(
        name="fewshot",
        system_prefix="{content}",
        system_suffix="\n\n",
        user_prefix="{content}",
        user_suffix="\n\n",
        assistant_prefix="",
        turn_suffix="\n\n",
    )
)
