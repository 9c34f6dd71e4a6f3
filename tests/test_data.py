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


def test_new_template_renderings():
    """Spot-check the round-3 template registrations against the exact turn
    formats of the reference registry (template.py, cited per template)."""
    from infinitevl_tpu.data.template import get_template

    msgs = [
        {"role": "system", "content": "SYS"},
        {"role": "user", "content": "U1"},
        {"role": "assistant", "content": "A1"},
        {"role": "user", "content": "U2"},
    ]
    gem = get_template("gemma").render_prompt(msgs)
    assert gem == (
        "<bos>SYS\n\n<start_of_turn>user\nU1<end_of_turn>\n"
        "<start_of_turn>model\nA1<end_of_turn>\n"
        "<start_of_turn>user\nU2<end_of_turn>\n<start_of_turn>model\n"
    )
    phi4 = get_template("phi4").render_prompt(msgs[:3], add_generation_prompt=False)
    assert phi4 == (
        "<|im_start|>system<|im_sep|>SYS<|im_end|>"
        "<|im_start|>user<|im_sep|>U1<|im_end|>"
        "<|im_start|>assistant<|im_sep|>A1<|im_end|>"
    )
    # mistral: system inlines into the FIRST user turn (Llama2Template)
    mis = get_template("mistral").render_prompt(msgs)
    assert mis == "<s>[INST] SYS\n\nU1[/INST] A1</s>[INST] U2[/INST] "
    ds3 = get_template("deepseek3").render_prompt(msgs[1:3], add_generation_prompt=False)
    assert ds3 == "<｜begin▁of▁sentence｜><｜User｜>U1<｜Assistant｜>A1<｜end▁of▁sentence｜>"
    glm = get_template("glm4").render_prompt(msgs[:2])
    assert glm == "[gMASK]<sop><|system|>\nSYS<|user|>\nU1<|assistant|>\n"
    vic = get_template("vicuna").render_prompt([msgs[1]])
    assert vic.startswith("A chat between a curious user")
    assert vic.endswith("USER: U1 ASSISTANT:")


def test_new_templates_supervision_mask():
    """encode_turns on the new formats: assistant bodies supervised, the
    rest masked — for every newly-registered family."""
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.data.template import get_template

    msgs = [
        {"role": "user", "content": "hello there"},
        {"role": "assistant", "content": "general kenobi"},
    ]
    for name in ("gemma", "phi", "phi4", "mistral", "mistral_small",
                 "llama2", "deepseek", "deepseek3", "glm4", "yi", "zephyr",
                 "vicuna", "alpaca", "default", "baichuan2", "fewshot",
                 # round-3 breadth batch
                 "aquila", "atom", "baichuan", "bailing", "belle", "bluelm",
                 "breeze", "chatglm3", "codegeex4", "cohere", "cpm", "cpm3",
                 "dbrx", "deepseekcoder", "exaone", "falcon", "granite3",
                 "hunyuan", "index", "intern", "intern2", "llava",
                 "llava_next", "marco", "minicpm_o", "minicpm_v",
                 "moonlight", "olmo", "openchat", "opencoder", "orion",
                 "sailor", "skywork_o1", "solar", "starchat", "telechat",
                 "telechat2", "xverse", "yayi", "yi_vl", "yuan", "ziya",
                 # registry-closing batch
                 "chatml_de", "chatglm2", "codegeex2", "mllama",
                 "llava_next_llama3", "openchat-3.6", "ministral", "pixtral",
                 "llava_next_mistral", "llava_next_video_mistral",
                 "llava_next_qwen", "llava_next_yi", "llava_next_video_yi",
                 "qwen2_audio", "llava_next_video", "video_llava",
                 "paligemma", "paligemma_chat", "phi_small", "xuanyuan"):
        tok = SimpleTokenizer()
        ids, labels = get_template(name).encode_turns(tok, msgs)
        assert len(ids) == len(labels) > 0, name
        assert labels[0] == -100, name
        sup = [i for i, l in zip(ids, labels) if l != -100]
        assert sup, name
        assert "general" in tok.decode(sup), name


def test_load_examples_glob(tmp_path):
    """file_name may be a glob over local shards (hub-style)."""
    import json as _json

    from infinitevl_tpu.data.loader import DatasetAttr, load_examples

    for i in range(3):
        rows = [{"instruction": f"q{i}-{j}", "output": f"a{i}-{j}"}
                for j in range(2)]
        (tmp_path / f"part-{i}.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )
    attr = DatasetAttr(name="sharded", file_name="part-*.jsonl")
    ex = load_examples(attr, str(tmp_path))
    assert len(ex) == 6
    assert ex[0]["messages"][0]["content"] == "q0-0"  # sorted shard order


def test_mix_strategies(tmp_path):
    import json as _json

    from infinitevl_tpu.data.loader import (
        DatasetAttr,
        load_mixed_examples,
    )

    (tmp_path / "a.json").write_text(_json.dumps(
        [{"instruction": f"a{i}", "output": "x"} for i in range(4)]
    ))
    (tmp_path / "b.json").write_text(_json.dumps(
        [{"instruction": f"b{i}", "output": "y"} for i in range(12)]
    ))
    reg = {
        "a": DatasetAttr(name="a", file_name="a.json"),
        "b": DatasetAttr(name="b", file_name="b.json"),
    }
    cat = load_mixed_examples(["a", "b"], reg, str(tmp_path))
    assert len(cat) == 16
    assert cat[0]["messages"][0]["content"] == "a0"
    under = load_mixed_examples(
        ["a", "b"], reg, str(tmp_path), mix_strategy="interleave_under",
        interleave_probs=[0.5, 0.5], seed=0,
    )
    # stops when either set is exhausted -> can never exceed 2*min+... and
    # must contain rows from both
    srcs = {m["messages"][0]["content"][0] for m in under}
    assert srcs == {"a", "b"}
    assert len(under) < 16
    over = load_mixed_examples(
        ["a", "b"], reg, str(tmp_path), mix_strategy="interleave_over",
        interleave_probs=[0.75, 0.25], seed=0,
    )
    # all_exhausted: every row of both sets appears at least once
    texts = [m["messages"][0]["content"] for m in over]
    assert all(f"a{i}" in texts for i in range(4))
    assert all(f"b{i}" in texts for i in range(12))


def test_template_registry_covers_reference():
    """Every template name registered by the reference
    (src/llamafactory/data/template.py register_template calls) exists in
    our registry. 'base'/'custom' regex hits in the reference are an
    mm_plugin name and a docstring example, not registrations."""
    import os
    import re

    from infinitevl_tpu.data.template import _TEMPLATES

    ref = "/root/reference/src/llamafactory/data/template.py"
    if not os.path.exists(ref):
        import pytest

        pytest.skip("reference tree not present")
    names = set(re.findall(r'^\s*name="([^"]+)"', open(ref).read(), re.M))
    names -= {"custom"}  # docstring example, not a registration
    missing = names - set(_TEMPLATES)
    assert not missing, f"missing templates: {sorted(missing)}"


def test_chatglm2_round_numbering():
    """chatglm2 {idx} slot: reference template.py:138 passes idx=i//2 over
    the user/assistant alternation -> first user turn is Round 0."""
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.data.template import get_template

    t = get_template("chatglm2")
    msgs = [
        {"role": "user", "content": "U1"},
        {"role": "assistant", "content": "A1"},
        {"role": "user", "content": "U2"},
    ]
    s = t.render_prompt(msgs, add_generation_prompt=False)
    assert s == "[gMASK]sop[Round 0]\n\n问：U1\n\n答：A1[Round 1]\n\n问：U2\n\n答："
    # encode path numbers identically and supervises only assistant bodies
    tok = SimpleTokenizer()
    ids, labels = t.encode_turns(tok, msgs)
    text = tok.decode(ids)
    assert "[Round 0]" in text and "[Round 1]" in text


def test_registry_tags_folder_num_samples(tmp_path):
    """Reference dataset_info attributes beyond file/formatting/columns:
    sharegpt `tags` rename role/content keys and role spellings
    (data/parser.py:68-80), `folder` nests under dataset_dir, and
    `num_samples` caps rows at load time."""
    import json as _json
    import os

    from infinitevl_tpu.data.loader import load_dataset_info, load_examples

    sub = tmp_path / "corpus"
    sub.mkdir()
    rows = [
        {"dialog": [
            {"who": "Q", "text": f"question {i}"},
            {"who": "A", "text": f"answer {i}"},
        ]}
        for i in range(5)
    ]
    (sub / "tagged.json").write_text(_json.dumps(rows))
    (tmp_path / "dataset_info.json").write_text(_json.dumps({
        "tagged": {
            "file_name": "tagged.json",
            "folder": "corpus",
            "formatting": "sharegpt",
            "num_samples": 3,
            "columns": {"messages": "dialog"},
            "tags": {
                "role_tag": "who", "content_tag": "text",
                "user_tag": "Q", "assistant_tag": "A",
            },
        }
    }))
    reg = load_dataset_info(os.path.join(str(tmp_path), "dataset_info.json"))
    ex = load_examples(reg["tagged"], str(tmp_path))
    assert len(ex) == 3  # num_samples cap
    assert ex[0]["messages"] == [
        {"role": "user", "content": "question 0"},
        {"role": "assistant", "content": "answer 0"},
    ]


def test_shipped_registry_breadth():
    """The shipped data/dataset_info.json mirrors the reference's public-hub
    registry (dataset_info.json, 96 entries): every hub entry resolves to a
    DatasetAttr with its format/column/tag metadata; `_`-prefixed keys are
    provenance comments, not datasets."""
    import os

    from infinitevl_tpu.data.loader import load_dataset_info

    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "dataset_info.json")
    reg = load_dataset_info(path)
    assert len(reg) >= 80
    assert not any(n.startswith("_") for n in reg)
    uc = reg["ultrachat_200k"]
    assert uc.hf_hub_url == "HuggingFaceH4/ultrachat_200k"
    assert uc.formatting == "sharegpt" and uc.split == "train_sft"
    assert uc.tags["role_tag"] == "role"
    # local fixtures stay loadable alongside the hub entries
    assert reg["demo"].file_name == "demo.json"
    # preference data keeps the ranking bit
    assert any(a.ranking for a in reg.values())


def test_hub_loading_via_datasets_lib(tmp_path):
    """hf_hub_url routes through datasets.load_dataset (reference
    data/loader.py:123-137). A local directory path exercises the exact
    hub code path offline (same builder resolution)."""
    import json as _json

    from infinitevl_tpu.data.loader import (
        DatasetAttr,
        iter_examples,
        load_examples,
    )

    hub_dir = tmp_path / "hubset"
    hub_dir.mkdir()
    rows = [{"instruction": f"q{i}", "output": f"a{i}"} for i in range(5)]
    (hub_dir / "train.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows)
    )
    attr = DatasetAttr(name="hubset", hf_hub_url=str(hub_dir), num_samples=3)
    ex = load_examples(attr, str(tmp_path))
    assert len(ex) == 3  # num_samples caps materialized loads
    assert ex[0]["messages"][0]["content"] == "q0"
    assert ex[0]["messages"][1]["content"] == "a0"
    # streaming: IterableDataset path, num_samples ignored (reference
    # loader.py:139 applies it only when not streaming)
    streamed = list(iter_examples(attr, str(tmp_path)))
    assert [m["messages"][0]["content"] for m in streamed] == [
        f"q{i}" for i in range(5)
    ]


def test_stream_mixed_matches_materialized(tmp_path):
    """The lazy mixer must reproduce load_mixed_examples' sequence exactly
    for every strategy (same rng draw order, same wrap-around)."""
    import json as _json

    from infinitevl_tpu.data.loader import (
        DatasetAttr,
        load_mixed_examples,
        stream_mixed_examples,
    )

    (tmp_path / "a.jsonl").write_text("\n".join(
        _json.dumps({"instruction": f"a{i}", "output": "x"}) for i in range(4)
    ))
    (tmp_path / "b.jsonl").write_text("\n".join(
        _json.dumps({"instruction": f"b{i}", "output": "y"}) for i in range(9)
    ))
    reg = {
        "a": DatasetAttr(name="a", file_name="a.jsonl"),
        "b": DatasetAttr(name="b", file_name="b.jsonl"),
    }
    for strat, probs in (
        ("concat", None),
        ("interleave_under", [0.5, 0.5]),
        ("interleave_over", [0.7, 0.3]),
    ):
        want = load_mixed_examples(
            ["a", "b"], reg, str(tmp_path), mix_strategy=strat,
            interleave_probs=probs, seed=3,
        )
        got = list(stream_mixed_examples(
            ["a", "b"], reg, str(tmp_path), mix_strategy=strat,
            interleave_probs=probs, seed=3,
        ))
        assert got == want, strat


def test_encode_supervised_stream_matches_and_rejects_mm():
    import numpy as np
    import pytest as _pytest

    from infinitevl_tpu.data.loader import (
        SimpleTokenizer,
        encode_supervised,
        encode_supervised_stream,
    )

    exs = [
        {"messages": [{"role": "user", "content": f"hello {i}"},
                      {"role": "assistant", "content": f"world {i}"}]}
        for i in range(3)
    ]
    tok = SimpleTokenizer()
    want = encode_supervised(exs, tok, "qwen2_vl", 64)
    got = list(encode_supervised_stream(iter(exs), tok, "qwen2_vl", 64))
    for w, g in zip(want, got):
        assert np.array_equal(w["input_ids"], g["input_ids"])
        assert np.array_equal(w["labels"], g["labels"])
    mm_ex = [{"messages": [{"role": "user", "content": "<image> hi"}],
              "images": ["x.png"]}]
    with _pytest.raises(ValueError, match="text-only"):
        list(encode_supervised_stream(iter(mm_ex), tok, "qwen2_vl", 64))


def test_custom_template_from_yaml_dict():
    """`custom_template:` yaml dict registers a user-defined template at
    parse time (reference template.py:396-414 register_template hook) and
    `template: custom` resolves it from any workflow."""
    from infinitevl_tpu.data.template import get_template
    from infinitevl_tpu.hparams import parse_args

    parse_args(
        {
            "template": "custom",
            "custom_template": {
                "system_prefix": "<s>[SYS]{content}[/SYS]\n",
                "user_prefix": "<user>{content}\n<model>",
                "assistant_prefix": "",
                "turn_suffix": "</s>\n",
                "user_suffix": "",
                "stop_words": ["</s>"],
                "prefix": "<s>",
            },
        }
    )
    t = get_template("custom")
    text = t.render_prompt(
        [
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "yo"},
        ],
        add_generation_prompt=False,
    )
    assert text == "<s><user>hi\n<model>yo</s>\n"
    assert t.stop_words == ("</s>",)
    # unknown slot keys fail loudly
    with pytest.raises(ValueError, match="unknown custom_template"):
        parse_args(
            {"custom_template": {"bogus_slot": "x", "user_prefix": "u"}}
        )


def test_ms_hub_only_dataset_raises_clearly():
    """ModelScope-only registry entries (reference dataset_info.json
    deepctrl) must not be silently rewritten as HF repo ids — selecting one
    raises an actionable error instead of a hub 404."""
    from infinitevl_tpu.data.loader import DatasetAttr, iter_examples

    attr = DatasetAttr(name="deepctrl", ms_hub_url="deepctrl/deepctrl-sft-data")
    with pytest.raises(ValueError, match="ModelScope"):
        list(iter_examples(attr, "data"))
