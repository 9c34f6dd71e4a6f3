"""MMLU/C-Eval-style multiple-choice evaluator.

Reference: src/llamafactory/eval/evaluator.py:61-157 — few-shot prompt
templating, logit argmax over the choice-letter tokens, per-category
accuracy."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

CHOICES = ("A", "B", "C", "D")

# per-language instruction/answer strings (reference eval/template.py
# registers "en" and "zh" eval templates)
_LANG = {
    "en": {
        "system": (
            "The following are multiple choice questions (with answers) "
            "about {subject}.\n\n"
        ),
        "answer": "Answer:",
    },
    "zh": {
        "system": "以下是关于{subject}的单项选择题，请直接给出正确答案的选项。\n\n",
        "answer": "答案：",
    },
}


def format_example(
    example: Dict[str, Any],
    support_set: Sequence[Dict[str, Any]] = (),
    subject_name: str = "",
    lang: str = "en",
) -> str:
    """Few-shot MCQ prompt."""
    strings = _LANG.get(lang, _LANG["en"])
    parts = []
    if subject_name:
        parts.append(strings["system"].format(subject=subject_name))
    for ex in support_set:
        parts.append(_one(ex, strings, with_answer=True))
    parts.append(_one(example, strings, with_answer=False))
    return "".join(parts)


def _one(ex: Dict[str, Any], strings: Dict[str, str], with_answer: bool) -> str:
    s = ex["question"] + "\n"
    for c in CHOICES:
        if c in ex and ex[c]:
            s += f"{c}. {ex[c]}\n"
    s += strings["answer"]
    if with_answer:
        s += f" {ex['answer']}\n\n"
    return s


import functools

import jax


@functools.partial(jax.jit, static_argnames=("cfg",))
def _mcq_prefill(params, cfg, ids, pos, seg):
    """Last-position logits over a LEFT-padded batch: pads live in segment 0
    (masked from the real tokens by the packing masks), real tokens in
    segment 1 with positions starting at 0."""
    from ..models.infinitevl import forward

    logits, _ = forward(
        params, cfg, ids, pos, state=None, segment_ids=seg, logits_to_keep=1
    )
    return logits[:, 0]


def _bucket_len(n: int, quantum: int = 128) -> int:
    return max(quantum, -(-n // quantum) * quantum)


class MCQEvaluator:
    """Choice-logit MCQ scoring with LENGTH BUCKETING: prompts are
    left-padded to the next 128 multiple and scored in fixed-shape batches,
    so the evaluator compiles O(#buckets) programs instead of one per prompt
    length (each XLA compile costs 30-250 s through the relay)."""

    def __init__(self, generator, tokenizer, batch_size: int = 8,
                 lang: str = "en"):
        self.lang = lang
        self.generator = generator
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.choice_ids = [
            self.tokenizer.encode(f" {c}", add_special_tokens=False)[-1]
            for c in CHOICES
        ]

    def _score_prompts(self, prompts: Sequence[str]) -> List[str]:
        cfg = self.generator.cfg
        params = self.generator.params
        encoded = [
            np.asarray(self.tokenizer.encode(p, add_special_tokens=False), np.int64)
            for p in prompts
        ]
        preds: List[Optional[str]] = [None] * len(prompts)
        by_bucket: Dict[int, List[int]] = {}
        for i, ids in enumerate(encoded):
            by_bucket.setdefault(_bucket_len(len(ids)), []).append(i)
        B = self.batch_size
        for P, idxs in sorted(by_bucket.items()):
            for s in range(0, len(idxs), B):
                chunk = idxs[s : s + B]
                rows = (chunk * B)[:B]  # repeat to fill the static batch
                ids = np.zeros((B, P), np.int64)
                seg = np.zeros((B, P), np.int32)
                pos = np.zeros((B, P), np.int64)
                for r, i in enumerate(rows):
                    e = encoded[i][-P:]
                    L = len(e)
                    ids[r, P - L :] = e
                    seg[r, P - L :] = 1
                    pos[r, P - L :] = np.arange(L)
                pos3 = np.broadcast_to(pos[None], (3, B, P))
                logits = _mcq_prefill(
                    params, cfg, jnp.asarray(ids), jnp.asarray(pos3),
                    jnp.asarray(seg),
                )
                scores = np.asarray(logits)[:, self.choice_ids]
                for r, i in enumerate(chunk):
                    preds[i] = CHOICES[int(np.argmax(scores[r]))]
        return preds  # type: ignore[return-value]

    def score_one(self, prompt: str) -> str:
        """Argmax over the choice-letter logits at the next position."""
        return self._score_prompts([prompt])[0]

    def evaluate(
        self,
        examples: Sequence[Dict[str, Any]],
        support_set: Sequence[Dict[str, Any]] = (),
        subject_name: str = "",
    ) -> Dict[str, float]:
        prompts = [
            format_example(ex, support_set, subject_name, lang=self.lang)
            for ex in examples
        ]
        preds = self._score_prompts(prompts)
        correct = 0
        per_category: Dict[str, List[bool]] = {}
        for ex, pred in zip(examples, preds):
            ok = pred == ex["answer"]
            correct += ok
            cat = ex.get("category", "all")
            per_category.setdefault(cat, []).append(ok)
        out = {"accuracy": correct / max(len(examples), 1)}
        for cat, oks in per_category.items():
            out[f"accuracy/{cat}"] = sum(oks) / len(oks)
        return out

    def evaluate_task(
        self, task: Dict[str, Dict[str, Any]], n_shot: int = 5
    ) -> Dict[str, float]:
        """MMLU-style benchmark: {subject: {name, dev: [...], test: [...]}}.

        Few-shot support comes from each subject's dev split (reference
        eval/evaluator.py:78-101); returns overall + per-subject accuracy."""
        out: Dict[str, float] = {}
        total_ok = 0
        total_n = 0
        for subject, block in task.items():
            support = list(block.get("dev", ()))[: max(n_shot, 0)]
            examples = block["test"]
            metrics = self.evaluate(
                examples, support, block.get("name", subject)
            )
            out[f"accuracy/{subject}"] = metrics["accuracy"]
            total_ok += metrics["accuracy"] * len(examples)
            total_n += len(examples)
        out["accuracy"] = total_ok / max(total_n, 1)
        return out
