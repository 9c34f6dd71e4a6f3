"""MMLU/C-Eval-style multiple-choice evaluator.

Reference: src/llamafactory/eval/evaluator.py:61-157 — few-shot prompt
templating, logit argmax over the choice-letter tokens, per-category
accuracy."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

CHOICES = ("A", "B", "C", "D")


def format_example(
    example: Dict[str, Any],
    support_set: Sequence[Dict[str, Any]] = (),
    subject_name: str = "",
) -> str:
    """Few-shot MCQ prompt."""
    parts = []
    if subject_name:
        parts.append(
            f"The following are multiple choice questions (with answers) "
            f"about {subject_name}.\n\n"
        )
    for ex in support_set:
        parts.append(_one(ex, with_answer=True))
    parts.append(_one(example, with_answer=False))
    return "".join(parts)


def _one(ex: Dict[str, Any], with_answer: bool) -> str:
    s = ex["question"] + "\n"
    for c in CHOICES:
        if c in ex and ex[c]:
            s += f"{c}. {ex[c]}\n"
    s += "Answer:"
    if with_answer:
        s += f" {ex['answer']}\n\n"
    return s


class MCQEvaluator:
    def __init__(self, generator, tokenizer):
        self.generator = generator
        self.tokenizer = tokenizer
        self.choice_ids = [
            self.tokenizer.encode(f" {c}", add_special_tokens=False)[-1]
            for c in CHOICES
        ]

    def score_one(self, prompt: str) -> str:
        """Argmax over the choice-letter logits at the next position."""
        import jax

        from ..generation import prefill
        from ..models.state import init_decoder_state

        ids = np.asarray(
            [self.tokenizer.encode(prompt, add_special_tokens=False)], np.int64
        )
        cfg = self.generator.cfg
        state = init_decoder_state(cfg.text, 1, dtype=self.generator.dtype)
        pos = np.broadcast_to(
            np.arange(ids.shape[1])[None, None], (3, 1, ids.shape[1])
        )
        logits, _ = prefill(
            self.generator.params, cfg, jnp.asarray(ids), jnp.asarray(pos), state
        )
        scores = np.asarray(logits[0])[self.choice_ids]
        return CHOICES[int(np.argmax(scores))]

    def evaluate(
        self,
        examples: Sequence[Dict[str, Any]],
        support_set: Sequence[Dict[str, Any]] = (),
        subject_name: str = "",
    ) -> Dict[str, float]:
        correct = 0
        per_category: Dict[str, List[bool]] = {}
        for ex in examples:
            pred = self.score_one(format_example(ex, support_set, subject_name))
            ok = pred == ex["answer"]
            correct += ok
            cat = ex.get("category", "all")
            per_category.setdefault(cat, []).append(ok)
        out = {"accuracy": correct / max(len(examples), 1)}
        for cat, oks in per_category.items():
            out[f"accuracy/{cat}"] = sum(oks) / len(oks)
        return out
