"""Dataset registry, format converters, and supervised encoding.

Covers the reference data layer's core surface
(src/llamafactory/data/loader.py:51-323, converter.py, dataset_info.json):
- a JSON registry (`dataset_info.json`) keyed by dataset name, with
  file/format/column metadata
- alpaca and sharegpt converters to the unified message format
- supervised example encoding through a chat template
- greedy-knapsack sequence packing with per-segment ids
  (the reference's neat_packing, data/processor/supervised.py:139-215 +
  processor_utils.py:48-64); segment ids feed the kernels' packing masks
  (the TPU-idiomatic replacement for cu_seqlens).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .template import IGNORE_INDEX, Template, get_template


@dataclasses.dataclass
class DatasetAttr:
    name: str
    file_name: Optional[str] = None
    formatting: str = "alpaca"  # alpaca | sharegpt
    columns: Optional[Dict[str, str]] = None
    split: str = "train"


def load_dataset_info(path: str) -> Dict[str, DatasetAttr]:
    with open(path) as f:
        info = json.load(f)
    out = {}
    for name, meta in info.items():
        out[name] = DatasetAttr(
            name=name,
            file_name=meta.get("file_name"),
            formatting=meta.get("formatting", "alpaca"),
            columns=meta.get("columns"),
            split=meta.get("split", "train"),
        )
    return out


def convert_alpaca(ex: Dict[str, Any], columns: Optional[Dict[str, str]] = None):
    """{'instruction', 'input', 'output'[, 'system','history']} -> messages."""
    c = columns or {}
    prompt = ex.get(c.get("prompt", "instruction"), "") or ""
    query = ex.get(c.get("query", "input"), "") or ""
    response = ex.get(c.get("response", "output"), "") or ""
    system = ex.get(c.get("system", "system"), None)
    msgs: List[Dict[str, str]] = []
    if system:
        msgs.append({"role": "system", "content": system})
    for h in ex.get(c.get("history", "history"), []) or []:
        msgs.append({"role": "user", "content": h[0]})
        msgs.append({"role": "assistant", "content": h[1]})
    user = prompt + ("\n" + query if query else "")
    msgs.append({"role": "user", "content": user})
    msgs.append({"role": "assistant", "content": response})
    return {"messages": msgs, "images": ex.get("images"), "videos": ex.get("videos")}


def convert_sharegpt(ex: Dict[str, Any], columns: Optional[Dict[str, str]] = None):
    """{'conversations': [{'from': human|gpt|system, 'value': ...}]}."""
    c = columns or {}
    role_map = {"human": "user", "gpt": "assistant", "system": "system",
                "user": "user", "assistant": "assistant",
                "observation": "user", "function_call": "assistant"}
    msgs = []
    conv_key = c.get("messages", "conversations")
    for turn in ex[conv_key]:
        role = role_map[turn.get("from", turn.get("role"))]
        msgs.append({"role": role, "content": turn.get("value", turn.get("content", ""))})
    if ex.get(c.get("system", "system")):
        msgs.insert(0, {"role": "system", "content": ex[c.get("system", "system")]})
    return {"messages": msgs, "images": ex.get("images"), "videos": ex.get("videos")}


def load_examples(
    attr: DatasetAttr, data_dir: str = "data"
) -> List[Dict[str, Any]]:
    path = os.path.join(data_dir, attr.file_name)
    with open(path) as f:
        if path.endswith(".jsonl"):
            raw = [json.loads(line) for line in f if line.strip()]
        else:
            raw = json.load(f)
    conv = convert_alpaca if attr.formatting == "alpaca" else convert_sharegpt
    return [conv(ex, attr.columns) for ex in raw]


def encode_supervised(
    examples: Iterable[Dict[str, Any]],
    tokenizer,
    template: Template | str = "qwen2_vl",
    cutoff_len: int = 2048,
) -> List[Dict[str, np.ndarray]]:
    """Encode each example to {'input_ids', 'labels'} (truncated)."""
    if isinstance(template, str):
        template = get_template(template)
    out = []
    for ex in examples:
        ids, labels = template.encode_turns(tokenizer, ex["messages"])
        out.append(
            {
                "input_ids": np.asarray(ids[:cutoff_len], np.int64),
                "labels": np.asarray(labels[:cutoff_len], np.int64),
            }
        )
    return out


def greedy_knapsack(lengths: Sequence[int], capacity: int) -> List[List[int]]:
    """Pack example indices into bins of <= capacity total length
    (processor_utils.py:48-64 strategy: sort desc, first-fit)."""
    order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
    bins: List[Tuple[int, List[int]]] = []  # (remaining, indices)
    for i in order:
        L = min(lengths[i], capacity)
        for bi, (rem, idxs) in enumerate(bins):
            if L <= rem:
                bins[bi] = (rem - L, idxs + [i])
                break
        else:
            bins.append((capacity - L, [i]))
    return [idxs for _, idxs in bins]


def pack_examples(
    encoded: Sequence[Dict[str, np.ndarray]],
    cutoff_len: int,
    pad_token_id: int = 0,
) -> List[Dict[str, np.ndarray]]:
    """neat_packing: concat examples into cutoff_len rows with segment ids
    (1, 2, 3, ... per example, 0 = padding) so attention and the delta
    kernels can mask across boundaries."""
    lens = [len(e["input_ids"]) for e in encoded]
    packs = greedy_knapsack(lens, cutoff_len)
    out = []
    for idxs in packs:
        ids = np.full(cutoff_len, pad_token_id, np.int64)
        labels = np.full(cutoff_len, IGNORE_INDEX, np.int64)
        seg = np.zeros(cutoff_len, np.int32)
        off = 0
        for si, i in enumerate(idxs, start=1):
            e = encoded[i]
            L = min(len(e["input_ids"]), cutoff_len - off)
            ids[off : off + L] = e["input_ids"][:L]
            labels[off : off + L] = e["labels"][:L]
            seg[off : off + L] = si
            off += L
        out.append({"input_ids": ids, "labels": labels, "segment_ids": seg})
    return out


def shift_labels(labels: np.ndarray, pad: int = IGNORE_INDEX) -> np.ndarray:
    """Next-token alignment: label[t] supervises logits[t] for token t+1."""
    out = np.full_like(labels, pad)
    out[..., :-1] = labels[..., 1:]
    return out


class SimpleTokenizer:
    """Word-level tokenizer for tests and offline smoke runs (real
    deployments pass the HF Qwen2 tokenizer). Special tokens of the form
    <|...|> are split out even without surrounding whitespace."""

    _SPECIAL = __import__("re").compile(r"(<\|[^|>]+\|>)")

    def __init__(self, vocab: Optional[Dict[str, int]] = None, unk: int = 1,
                 config=None):
        self.vocab = dict(vocab or {})
        self.unk = unk
        self.eos_token_id = 2
        if config is not None:
            # pin vision control tokens to the config's ids so multimodal
            # masks line up in offline smoke runs
            self.vocab["<|image_pad|>"] = config.image_token_id
            self.vocab["<|video_pad|>"] = config.video_token_id
            self.vocab["<|vision_start|>"] = config.vision_start_token_id
            self.vocab["<|vision_end|>"] = config.vision_end_token_id
            self.eos_token_id = config.eos_token_id

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = []
        for piece in self._SPECIAL.split(text.replace("\n", " \\n ")):
            words = [piece] if self._SPECIAL.fullmatch(piece) else piece.split()
            for w in words:
                if w not in self.vocab:
                    self.vocab[w] = len(self.vocab) + 10
                ids.append(self.vocab[w])
        return ids

    def decode(self, ids, skip_special_tokens=True):
        rev = {v: k for k, v in self.vocab.items()}
        return " ".join(rev.get(int(i), "<unk>") for i in ids)
