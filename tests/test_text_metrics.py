"""BLEU/ROUGE similarity metrics (reference train/sft/metric.py
ComputeSimilarity + scripts/eval_bleu_rouge.py)."""

from infinitevl_tpu.eval.text_metrics import (
    bleu4,
    compute_similarity,
    rouge_l,
    rouge_n,
    tokenize,
)


def test_identical_is_perfect():
    toks = tokenize("the quick brown fox jumps over the lazy dog")
    assert abs(bleu4(toks, toks) - 1.0) < 1e-9
    assert abs(rouge_l(toks, toks) - 1.0) < 1e-9
    assert abs(rouge_n(toks, toks, 2) - 1.0) < 1e-9
    s = compute_similarity(["a b c d e"], ["a b c d e"])
    assert s["bleu-4"] == 100.0 and s["rouge-l"] == 100.0


def test_disjoint_is_zero():
    p = tokenize("alpha beta gamma delta")
    r = tokenize("one two three four")
    assert rouge_l(p, r) == 0.0
    assert rouge_n(p, r, 1) == 0.0
    # method3 smoothing floors each zero-match precision at 1/(2^k * total),
    # so fully-disjoint short strings score ~0.08, not exactly 0
    assert 0.0 < bleu4(p, r) < 0.1


def test_rouge_l_subsequence():
    # lcs("a b c d", "a x c d") = 3 -> F1 = 3/4
    p = tokenize("a b c d")
    r = tokenize("a x c d")
    assert abs(rouge_l(p, r) - 0.75) < 1e-9


def test_bleu_brevity_penalty():
    ref = tokenize("a b c d e f g h")
    short = tokenize("a b c d")
    full = tokenize("a b c d e f g h")
    assert bleu4(short, ref) < bleu4(full, ref)


def test_known_bleu_value():
    # hand-checked: pred 4 tokens, 3/4 unigrams, 2/3 bigrams, 1/2 trigrams
    # match; zero 4-grams (smoothed); BP = exp(1 - 5/4)... pred shorter
    p = tokenize("the cat sat down")
    r = tokenize("the cat sat on mat")
    import math

    p1, p2, p3 = 3 / 4, 2 / 3, 1 / 2
    p4 = 1.0 / (2 * 1)  # invcnt doubled once, 1 possible 4-gram
    expect = math.exp(1 - 5 / 4) * math.exp(
        (math.log(p1) + math.log(p2) + math.log(p3) + math.log(p4)) / 4
    )
    assert abs(bleu4(p, r) - expect) < 1e-9


def test_cjk_char_fallback():
    assert tokenize("你好 world") == ["你", "好", "world"]
    s = compute_similarity(["你好世界"], ["你好世界"])
    assert s["rouge-l"] == 100.0


def test_empty_safe():
    assert compute_similarity([""], ["ref text"])["bleu-4"] == 0.0
    assert compute_similarity([], []) == {
        "rouge-1": 0.0, "rouge-2": 0.0, "rouge-l": 0.0, "bleu-4": 0.0,
    }
