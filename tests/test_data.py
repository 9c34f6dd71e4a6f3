"""Data layer: templates, converters, packing, preprocessing."""

import numpy as np
import pytest

from infinitevl_tpu.data import (
    IGNORE_INDEX,
    SimpleTokenizer,
    convert_alpaca,
    convert_sharegpt,
    encode_supervised,
    get_template,
    greedy_knapsack,
    pack_examples,
    patchify,
    preprocess_image,
    shift_labels,
    smart_resize,
)


def test_template_render():
    t = get_template("qwen2_vl")
    msgs = [{"role": "user", "content": "hi"}]
    s = t.render_prompt(msgs)
    assert s.startswith("<|im_start|>system\nYou are a helpful assistant.")
    assert "<|im_start|>user\nhi<|im_end|>" in s
    assert s.endswith("<|im_start|>assistant\n")


def test_template_encode_labels_mask():
    t = get_template("qwen2_vl")
    tok = SimpleTokenizer()
    msgs = [
        {"role": "user", "content": "question here"},
        {"role": "assistant", "content": "answer words"},
    ]
    ids, labels = t.encode_turns(tok, msgs)
    assert len(ids) == len(labels)
    sup = [l for l in labels if l != IGNORE_INDEX]
    assert 0 < len(sup) < len(labels)
    # supervised ids equal the tail of input ids over assistant body
    assert sup == ids[len(ids) - len(sup):]


def test_converters():
    al = convert_alpaca(
        {"instruction": "add", "input": "1 2", "output": "3",
         "history": [["hi", "hello"]]}
    )
    roles = [m["role"] for m in al["messages"]]
    assert roles == ["user", "assistant", "user", "assistant"]
    assert al["messages"][-1]["content"] == "3"
    sg = convert_sharegpt(
        {"conversations": [{"from": "human", "value": "q"},
                           {"from": "gpt", "value": "a"}]}
    )
    assert [m["role"] for m in sg["messages"]] == ["user", "assistant"]


def test_knapsack_and_packing():
    lengths = [10, 20, 30, 15, 5]
    bins = greedy_knapsack(lengths, 32)
    flat = sorted(i for b in bins for i in b)
    assert flat == [0, 1, 2, 3, 4]
    for b in bins:
        assert sum(min(lengths[i], 32) for i in b) <= 32

    enc = [
        {"input_ids": np.arange(1, 9), "labels": np.arange(1, 9)},
        {"input_ids": np.arange(10, 14), "labels": np.arange(10, 14)},
    ]
    packs = pack_examples(enc, cutoff_len=16)
    assert len(packs) == 1
    p = packs[0]
    seg = p["segment_ids"]
    assert (seg[:8] == seg[0]).all() and seg[0] != 0
    assert (seg[8:12] == seg[8]).all() and seg[8] not in (0, seg[0])
    assert (seg[12:] == 0).all()
    assert (p["labels"][12:] == IGNORE_INDEX).all()


def test_shift_labels():
    labels = np.array([[1, 2, 3, IGNORE_INDEX]])
    s = shift_labels(labels)
    assert s.tolist() == [[2, 3, IGNORE_INDEX, IGNORE_INDEX]]


def test_smart_resize():
    h, w = smart_resize(300, 500, factor=28)
    assert h % 28 == 0 and w % 28 == 0
    # clamps to max pixels
    h, w = smart_resize(4000, 4000, factor=28, max_pixels=28 * 28 * 100)
    assert h * w <= 28 * 28 * 100
    with pytest.raises(ValueError):
        smart_resize(10000, 10, factor=28)


def test_preprocess_image_shapes():
    img = (np.random.RandomState(0).rand(100, 150, 3) * 255).astype(np.uint8)
    flat, grid = preprocess_image(img)
    t, gh, gw = grid
    assert t == 1
    assert flat.shape == (t * gh * gw, 3 * 2 * 14 * 14)
    # grid dims are merge-aligned
    assert gh % 2 == 0 and gw % 2 == 0


def test_patchify_layout_matches_conv3d_equivalence():
    """patchify + matmul == per-patch extraction: spot-check one patch."""
    ps, tps, m = 2, 1, 2
    frames = np.random.RandomState(1).rand(1, 8, 8, 3).astype(np.float32)
    flat, (t, gh, gw) = patchify(frames, ps, tps, m)
    assert flat.shape == (gh * gw, 3 * tps * ps * ps)
    # token order is merger-aware: token 0 = patch (0,0), token 1 = (0,1),
    # token 2 = (1,0), token 3 = (1,1) (2x2 merge block row-major)
    patch_rc = lambda r, c: frames[0, r*ps:(r+1)*ps, c*ps:(c+1)*ps, :].transpose(2, 0, 1).reshape(-1)
    np.testing.assert_allclose(flat[0], patch_rc(0, 0), rtol=1e-6)
    np.testing.assert_allclose(flat[1], patch_rc(0, 1), rtol=1e-6)
    np.testing.assert_allclose(flat[2], patch_rc(1, 0), rtol=1e-6)
    np.testing.assert_allclose(flat[3], patch_rc(1, 1), rtol=1e-6)
    # token 4 starts the next merge block: patch (0, 2)
    np.testing.assert_allclose(flat[4], patch_rc(0, 2), rtol=1e-6)


def test_encode_supervised_cutoff():
    tok = SimpleTokenizer()
    ex = convert_alpaca({"instruction": "a " * 50, "input": "", "output": "b " * 50})
    enc = encode_supervised([ex], tok, cutoff_len=32)
    assert len(enc[0]["input_ids"]) == 32


def test_llama3_template_render_and_encode():
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.data.template import IGNORE_INDEX, get_template

    t = get_template("llama3")
    msgs = [
        {"role": "user", "content": "hello"},
        {"role": "assistant", "content": "world"},
    ]
    prompt = t.render_prompt(msgs[:1])
    assert prompt == (
        "<|begin_of_text|><|start_header_id|>user<|end_header_id|>\n\n"
        "hello<|eot_id|><|start_header_id|>assistant<|end_header_id|>\n\n"
    )
    tok = SimpleTokenizer()
    ids, labels = t.encode_turns(tok, msgs)
    # assistant body (content + <|eot_id|>) supervised, all else masked
    sup = [i for i, l in zip(ids, labels) if l != IGNORE_INDEX]
    text = tok.decode(sup, skip_special_tokens=False)
    assert "world" in text and "<|eot_id|>" in text
    assert labels[0] == IGNORE_INDEX  # the <|begin_of_text|> prefix


def test_qwen_text_template_matches_qwen2_vl():
    from infinitevl_tpu.data.template import get_template

    msgs = [{"role": "user", "content": "hi"}]
    assert get_template("qwen").render_prompt(msgs) == get_template(
        "qwen2_vl"
    ).render_prompt(msgs)
