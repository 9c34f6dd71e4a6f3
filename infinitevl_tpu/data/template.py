"""Chat template engine.

Minimal, tokenizer-agnostic re-design of the reference's template registry
(src/llamafactory/data/template.py:40-1575): a template renders a message
list into prompt/response strings with the family's control tokens, and
`encode_turns` produces (input_ids, labels) with non-assistant tokens masked
to IGNORE_INDEX. Only the families InfiniteVL ships with are registered
(qwen2_vl and plain chatml); the registry is open for more.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class Template:
    name: str
    system_prefix: str  # format with {content}
    user_prefix: str
    assistant_prefix: str
    turn_suffix: str
    default_system: str = ""
    stop_words: Tuple[str, ...] = ()

    def render_prompt(
        self,
        messages: Sequence[Dict[str, str]],
        add_generation_prompt: bool = True,
    ) -> str:
        """messages: [{role: system|user|assistant, content: str}, ...]."""
        out = []
        has_system = any(m["role"] == "system" for m in messages)
        if not has_system and self.default_system:
            out.append(self.system_prefix.format(content=self.default_system))
            out.append(self.turn_suffix)
        for m in messages:
            role, content = m["role"], m["content"]
            if role == "system":
                out.append(self.system_prefix.format(content=content))
            elif role == "user":
                out.append(self.user_prefix.format(content=content))
            elif role == "assistant":
                out.append(self.assistant_prefix + content)
            else:
                raise ValueError(f"unknown role {role!r}")
            out.append(self.turn_suffix)
        if add_generation_prompt:
            out.append(self.assistant_prefix)
        return "".join(out)

    def encode_turns(
        self, tokenizer, messages: Sequence[Dict[str, str]]
    ) -> Tuple[List[int], List[int]]:
        """(input_ids, labels): labels = ids on assistant contents (+ the
        turn suffix), IGNORE_INDEX elsewhere — supervised SFT encoding
        (data/processor/supervised.py semantics)."""
        ids: List[int] = []
        labels: List[int] = []
        has_system = any(m["role"] == "system" for m in messages)
        if not has_system and self.default_system:
            seg = self.system_prefix.format(content=self.default_system) + self.turn_suffix
            t = tokenizer.encode(seg, add_special_tokens=False)
            ids += t
            labels += [IGNORE_INDEX] * len(t)
        for m in messages:
            role, content = m["role"], m["content"]
            if role == "assistant":
                prefix = tokenizer.encode(self.assistant_prefix, add_special_tokens=False)
                body = tokenizer.encode(content + self.turn_suffix, add_special_tokens=False)
                ids += prefix + body
                labels += [IGNORE_INDEX] * len(prefix) + body
            else:
                fmt = self.system_prefix if role == "system" else self.user_prefix
                seg = fmt.format(content=content) + self.turn_suffix
                t = tokenizer.encode(seg, add_special_tokens=False)
                ids += t
                labels += [IGNORE_INDEX] * len(t)
        return ids, labels


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
