"""End-to-end workflows: CLI train (sft + dt), checkpoint resume, HF export
round-trip, API server, MCQ evaluator."""

import json
import os
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.hparams import load_yaml_args, parse_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_args_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown config keys"):
        parse_args({"stage": "sft", "not_a_real_key": 1})


def test_sft_workflow_end_to_end(tmp_path):
    args = load_yaml_args(os.path.join(REPO, "examples", "sft_tiny.yaml"))
    args.train.output_dir = str(tmp_path)
    args.data.dataset_dir = os.path.join(REPO, "data")
    args.train.max_steps = 4
    from infinitevl_tpu.train.trainer import run_exp

    params = run_exp(args)
    assert params is not None
    # jsonl log written, loss plot produced
    log = os.path.join(str(tmp_path), "trainer_log.jsonl")
    assert os.path.exists(log)
    recs = [json.loads(l) for l in open(log)]
    assert any("loss" in r for r in recs)
    # checkpoint written and resumable
    from infinitevl_tpu.utils.checkpoint import latest_step

    assert latest_step(os.path.join(str(tmp_path), "checkpoints")) == 4


def test_dt_workflow_end_to_end(tmp_path):
    args = load_yaml_args(os.path.join(REPO, "examples", "dt_stage1_tiny.yaml"))
    args.train.output_dir = str(tmp_path)
    args.data.dataset_dir = os.path.join(REPO, "data")
    args.finetune.softmax_attention = (0, 4)
    from infinitevl_tpu.train.trainer import run_exp

    params = run_exp(args)
    assert params is not None


def test_export_roundtrip(tmp_path):
    from infinitevl_tpu.models.params import (
        init_params,
        load_hf_checkpoint,
        param_count,
    )
    from infinitevl_tpu.utils.checkpoint import export_hf_safetensors

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    out = str(tmp_path / "export")
    export_hf_safetensors(params, cfg, out)
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    assert os.path.exists(os.path.join(out, "config.json"))

    # config round-trips
    from infinitevl_tpu import from_hf_json

    cfg2 = from_hf_json(os.path.join(out, "config.json"))
    assert cfg2.text.layer_types == cfg.text.layer_types
    assert cfg2.vision.depth == cfg.vision.depth

    reloaded = load_hf_checkpoint(out, cfg, dtype=jnp.float32)
    assert param_count(reloaded) == param_count(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(reloaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # exported weights produce identical forward outputs
    from infinitevl_tpu.models.text import embed_tokens, text_forward

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.text.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(8)[None, None], (3, 1, 8))
    h1, _, _ = text_forward(params["text"], cfg.text, embed_tokens(params["text"], ids), pos)
    h2, _, _ = text_forward(reloaded["text"], cfg.text, embed_tokens(reloaded["text"], ids), pos)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_api_server():
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.generation import Generator
    from infinitevl_tpu.models.params import init_params
    from infinitevl_tpu.serve.api import ChatBackend, create_server

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    gen = Generator(params, cfg, dtype=jnp.float32)
    backend = ChatBackend(gen, SimpleTokenizer(), model_name="tiny")
    server = create_server(backend, host="127.0.0.1", port=0, api_key="sk-test")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # auth required
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/models")
        assert exc.value.code == 401

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/models",
            headers={"Authorization": "Bearer sk-test"},
        )
        models = json.loads(urllib.request.urlopen(req).read())
        assert models["data"][0]["id"] == "tiny"

        body = json.dumps(
            {
                "model": "tiny",
                "messages": [{"role": "user", "content": "hello world"}],
                "max_tokens": 4,
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=body,
            headers={
                "Authorization": "Bearer sk-test",
                "Content-Type": "application/json",
            },
        )
        res = json.loads(urllib.request.urlopen(req).read())
        assert res["object"] == "chat.completion"
        assert res["choices"][0]["message"]["role"] == "assistant"
        assert res["usage"]["completion_tokens"] >= 1

        # malformed request -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=b'{"messages": []}',
            headers={
                "Authorization": "Bearer sk-test",
                "Content-Type": "application/json",
            },
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
    finally:
        server.shutdown()


def test_mcq_evaluator():
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.eval.mcq import MCQEvaluator, format_example
    from infinitevl_tpu.generation import Generator
    from infinitevl_tpu.models.params import init_params

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    gen = Generator(params, cfg, dtype=jnp.float32)
    tok = SimpleTokenizer()
    ev = MCQEvaluator(gen, tok)
    examples = [
        {"question": "Pick A.", "A": "first", "B": "second", "answer": "A",
         "category": "demo"},
        {"question": "Pick B.", "A": "first", "B": "second", "answer": "B",
         "category": "demo"},
    ]
    prompt = format_example(examples[0], support_set=[examples[1]], subject_name="tests")
    assert "Answer: B" in prompt and prompt.endswith("Answer:")
    res = ev.evaluate(examples)
    assert 0.0 <= res["accuracy"] <= 1.0
    assert "accuracy/demo" in res


def test_cli_help_and_version(capsys):
    from infinitevl_tpu.cli import main

    assert main([]) == 0
    assert "train" in capsys.readouterr().out
    assert main(["version"]) == 0
    assert main(["bogus"]) == 2


def test_all_example_yamls_parse():
    """Every shipped example config must parse into AllArgs (typo guard)."""
    import glob

    for path in glob.glob(os.path.join(REPO, "examples", "*.yaml")):
        args = load_yaml_args(path)
        assert args.finetune.stage in ("pt", "sft", "dt", "rm", "dpo", "kto", "ppo"), path


def test_sft_do_predict_writes_scores(tmp_path):
    """do_predict (predict_with_generate analogue) generates the eval
    prompts after training and writes generated_predictions.jsonl +
    predict_results.json with BLEU/ROUGE keys (reference
    train/sft/workflow.py predict path)."""
    import json

    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import run_exp

    args = parse_args(
        {
            "config_preset": "tiny",
            "stage": "sft",
            "dataset": "demo",
            "dataset_dir": "data",
            "cutoff_len": 32,
            "per_device_train_batch_size": 1,
            "max_steps": 2,
            "logging_steps": 1,
            "save_steps": 1000,
            "bf16": False,
            "learning_rate": 1e-3,
            "output_dir": str(tmp_path),
            "do_predict": True,
            "predict_samples": 2,
            "max_new_tokens": 8,
        }
    )
    run_exp(args)
    with open(tmp_path / "predict_results.json") as f:
        scores = json.load(f)
    assert {"bleu-4", "rouge-1", "rouge-2", "rouge-l", "samples"} <= set(scores)
    assert scores["samples"] >= 1
    lines = (tmp_path / "generated_predictions.jsonl").read_text().strip().splitlines()
    assert len(lines) == scores["samples"]
    row = json.loads(lines[0])
    assert "predict" in row and "label" in row
    # the label must decode through the SAME tokenizer that encoded the
    # dataset: a fresh instance maps everything to <unk> and the scores
    # become fiction (regression guard)
    assert row["label"].strip() and "<unk>" not in row["label"]


def test_sft_lora_scan_layers(tmp_path):
    """LoRA + remat + scan_layers: the stacked-params training path runs
    end-to-end from yaml and exports an UNSTACKED merged model."""
    import json

    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import run_exp

    args = parse_args(
        {
            "config_preset": "tiny",
            "stage": "sft",
            "dataset": "demo",
            "dataset_dir": "data",
            "finetuning_type": "lora",
            "lora_rank": 2,
            "remat": True,
            "scan_layers": True,
            "cutoff_len": 32,
            "per_device_train_batch_size": 1,
            "max_steps": 2,
            "logging_steps": 1,
            "save_steps": 1000,
            "bf16": False,
            "learning_rate": 1e-3,
            "output_dir": str(tmp_path),
        }
    )
    merged = run_exp(args)
    assert "layers" in merged["text"] and "layer_stacks" not in merged["text"]
    assert len(merged["text"]["layers"]) == 8
    log = (tmp_path / "trainer_log.jsonl").read_text().strip().splitlines()
    assert len(log) >= 2 and "loss" in json.loads(log[0])


def test_api_multimodal_image_content():
    """OpenAI content-parts with a data-URI image route through the
    processor path (scripts/api_example/test_image.py request shape);
    remote URLs error cleanly (no egress / no SSRF)."""
    import base64
    import io

    from PIL import Image

    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.generation import Generator
    from infinitevl_tpu.models.params import init_params
    from infinitevl_tpu.serve.api import ChatBackend, create_server

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    gen = Generator(params, cfg, dtype=jnp.float32)
    backend = ChatBackend(gen, SimpleTokenizer(config=cfg), model_name="tiny")
    server = create_server(backend, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
        body = json.dumps(
            {
                "model": "tiny",
                "messages": [
                    {
                        "role": "user",
                        "content": [
                            {"type": "text", "text": "What is this? "},
                            {"type": "image_url", "image_url": {"url": uri}},
                        ],
                    }
                ],
                "max_tokens": 4,
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        res = json.loads(urllib.request.urlopen(req).read())
        assert res["choices"][0]["message"]["role"] == "assistant"
        assert res["usage"]["prompt_tokens"] > 4  # expanded vision pads

        # remote URL -> clean 400
        bad = json.dumps(
            {
                "model": "tiny",
                "messages": [
                    {
                        "role": "user",
                        "content": [
                            {"type": "image_url",
                             "image_url": {"url": "https://example.com/x.png"}},
                        ],
                    }
                ],
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=bad,
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
    finally:
        server.shutdown()


def test_sft_streaming_end_to_end(tmp_path):
    """streaming: true trains from a lazy pipeline (reference
    data_args.py:58-65): no materialized dataset, max_steps mandatory,
    max_samples rejected."""
    args = load_yaml_args(os.path.join(REPO, "examples", "sft_tiny.yaml"))
    args.train.output_dir = str(tmp_path)
    args.data.dataset_dir = os.path.join(REPO, "data")
    args.data.streaming = True
    args.data.buffer_size = 8
    args.data.packing = True
    args.train.max_steps = 4
    from infinitevl_tpu.train.trainer import run_exp

    params = run_exp(args)
    assert params is not None
    log = os.path.join(str(tmp_path), "trainer_log.jsonl")
    recs = [json.loads(l) for l in open(log)]
    assert any("loss" in r for r in recs)

    import dataclasses as _dc

    import pytest as _pytest

    bad = _dc.replace(args, train=_dc.replace(args.train, max_steps=None))
    with _pytest.raises(ValueError, match="max_steps"):
        run_exp(bad)
    bad2 = _dc.replace(args, data=_dc.replace(args.data, max_samples=10))
    with _pytest.raises(ValueError, match="max_samples"):
        run_exp(bad2)


def test_sft_val_size_eval_loss(tmp_path):
    """val_size carves a held-out split and eval_loss is logged every
    eval_steps and at the end (reference data_args.py:144-156 +
    eval_strategy='steps')."""
    args = load_yaml_args(os.path.join(REPO, "examples", "sft_tiny.yaml"))
    args.train.output_dir = str(tmp_path)
    args.data.dataset_dir = os.path.join(REPO, "data")
    args.data.val_size = 0.25
    args.train.eval_steps = 2
    args.train.max_steps = 4
    from infinitevl_tpu.train.trainer import run_exp

    params = run_exp(args)
    assert params is not None
    recs = [json.loads(l) for l in open(os.path.join(str(tmp_path), "trainer_log.jsonl"))]
    evals = [r for r in recs if "eval_loss" in r]
    # periodic eval at step 2, final eval at the last step (the 25% split
    # shrinks one epoch below max_steps, so training ends when data runs out)
    steps_seen = [r["current_steps"] for r in evals]
    assert steps_seen[0] == 2 and len(steps_seen) >= 2
    assert steps_seen[-1] == max(r["current_steps"] for r in recs)
    assert all(np.isfinite(r["eval_loss"]) and r["eval_loss"] > 0 for r in evals)


def test_split_val_streaming_and_fractional_guard():
    """Integer val_size peels the head off a stream; fractional raises."""
    import dataclasses as _dc

    import pytest as _pytest

    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import _split_val, build_dataset_stream

    args = parse_args({
        "stage": "sft", "config_preset": "tiny", "dataset": "demo",
        "dataset_dir": os.path.join(REPO, "data"), "streaming": True,
        "max_steps": 2, "val_size": 3,
    })
    rows = ({"input_ids": np.array([i]), "labels": np.array([i])} for i in range(10))
    train_it, eval_data = _split_val(args, rows, mm=False)
    assert [int(e["input_ids"][0]) for e in eval_data] == [0, 1, 2]
    assert [int(e["input_ids"][0]) for e in train_it] == list(range(3, 10))

    bad = _dc.replace(args, data=_dc.replace(args.data, val_size=0.1))
    with _pytest.raises(ValueError, match="val_size"):
        build_dataset_stream(bad)


def test_sft_lora_val_eval_loss(tmp_path):
    """LoRA-branch eval hook: loss with adapters attached over the split."""
    args = load_yaml_args(os.path.join(REPO, "examples", "sft_tiny.yaml"))
    args.train.output_dir = str(tmp_path)
    args.data.dataset_dir = os.path.join(REPO, "data")
    args.finetune.finetuning_type = "lora"
    args.data.val_size = 2
    args.train.max_steps = 2
    from infinitevl_tpu.train.trainer import run_exp

    assert run_exp(args) is not None
    recs = [json.loads(l) for l in open(os.path.join(str(tmp_path), "trainer_log.jsonl"))]
    assert any("eval_loss" in r and r["eval_loss"] > 0 for r in recs)


def test_reporter_tensorboard(tmp_path):
    """ReporterCallback equivalent: report_to=tensorboard writes event files
    (reference train/callbacks.py:356-385 reports run meta to trackers)."""
    from infinitevl_tpu.utils.logging import make_reporter

    rep = make_reporter("tensorboard", str(tmp_path), {"stage": "sft"})
    rep.log(1, loss=1.25, tokens_per_sec=100.0)
    rep.log(2, loss=1.0)
    rep.close()
    runs = os.path.join(str(tmp_path), "runs")
    files = os.listdir(runs)
    assert any(f.startswith("events.out.tfevents") for f in files), files

    import pytest

    with pytest.raises(ValueError):
        make_reporter("bogus-tracker", str(tmp_path))


def test_resume_auto_continues_from_latest(tmp_path):
    """resume_from_checkpoint="auto": relaunching the same yaml picks up the
    latest checkpoint under output_dir (elastic restart after preemption)."""
    import json as _json

    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import run_exp

    base = {
        "config_preset": "tiny",
        "stage": "sft",
        "dataset": "demo",
        "dataset_dir": "data",
        "cutoff_len": 32,
        "per_device_train_batch_size": 1,
        "max_steps": 2,
        "logging_steps": 1,
        "save_steps": 2,
        "bf16": False,
        "learning_rate": 1e-3,
        "output_dir": str(tmp_path),
    }
    run_exp(parse_args(base))
    # relaunch with 2 more steps; auto-resume must start from step 2
    run_exp(parse_args({**base, "max_steps": 4, "resume_from_checkpoint": "auto"}))
    recs = [
        _json.loads(l)
        for l in open(os.path.join(str(tmp_path), "trainer_log.jsonl"))
    ]
    steps = [r["current_steps"] for r in recs if "loss" in r]
    assert 3 in steps and 4 in steps, steps
    # the relaunch must NOT have re-trained steps 1..2 (they appear once,
    # from the first run)
    assert steps.count(1) == 1 and steps.count(2) == 1, steps
