"""Training web board: start a tiny run through the HTTP API, watch the log
stream, abort, and guard the path-traversal check (reference webui/ Runner +
LlamaBoard surface)."""

import json
import threading
import time
import urllib.request

import pytest


def _req(port, path, payload=None):
    url = f"http://127.0.0.1:{port}{path}"
    if payload is not None:
        r = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
    else:
        r = url
    with urllib.request.urlopen(r) as resp:
        return json.loads(resp.read())


@pytest.fixture()
def board(tmp_path):
    from infinitevl_tpu.serve.webui import create_board_server

    server = create_board_server(host="127.0.0.1", port=0, runs_root=str(tmp_path))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield port, str(tmp_path)
    server.shutdown()


def test_board_page_and_status(board):
    port, _ = board
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        html = r.read().decode()
    assert "InfiniteVL-TPU board" in html
    for tab in ("Train", "Evaluate", "Chat", "Export"):
        assert f">{tab}</button>" in html
    st = _req(port, "/api/status")
    assert st == {"running": False}
    # i18n dictionary + language selector (reference webui/locales.py role)
    assert "I18N" in html and "lang_sel" in html and "setLang" in html
    assert "\u8bad\u7ec3" in html  # zh "train" (decoded at module parse)
    # knob parity for this round's features
    assert "adam_mini" in html and "report_to" in html
    # progress bar + ETA (LlamaBoard runner progress role)
    assert "prog_bar" in html and "max_steps" in html


def test_board_train_run_and_log(board):
    port, root = board
    out = f"{root}/run1"
    cfg = {
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
        "output_dir": out,
    }
    res = _req(port, "/api/train", cfg)
    assert res.get("ok"), res
    # duplicate start is rejected while running (400), unless the tiny run
    # already finished
    try:
        _req(port, "/api/train", cfg)
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # wait for completion (tiny: a couple of compiles)
    for _ in range(240):
        st = _req(port, "/api/status")
        if not st["running"]:
            break
        time.sleep(1)
    assert not st["running"] and not st.get("error"), st
    # progress-bar inputs surfaced in status (max_steps + start time)
    assert st.get("max_steps") == 2 and st.get("started_at"), st
    log = _req(port, f"/api/log?run={out}")
    assert any("loss" in r for r in log["records"])
    runs = _req(port, "/api/runs")
    assert out in runs["runs"]


def test_board_rejects_bad_config_and_traversal(board):
    port, _ = board
    try:
        _req(port, "/api/train", {"stage": "sft", "bogus_key": 1})
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    try:
        _req(port, "/api/log?run=/etc")
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_board_templates_dataset_and_configs(board):
    """Round-3 tabs: template listing, dataset preview, config save/load."""
    port, root = board
    t = _req(port, "/api/templates")
    assert "qwen2_vl" in t["templates"] and len(t["templates"]) > 50
    prev = _req(port, "/api/dataset?name=demo&dir=data&template=qwen2_vl")
    assert prev["count"] > 0
    assert "<|im_start|>user" in prev["examples"][0]["rendered"]
    # config save -> list -> get round trip
    cfg = {"stage": "sft", "dataset": "demo", "cutoff_len": 64}
    res = _req(port, "/api/config/save", {"name": "t1", "config": cfg})
    assert res.get("ok"), res
    lst = _req(port, "/api/config/list")
    assert "t1" in lst["configs"]
    got = _req(port, "/api/config/get?name=t1")
    assert got["config"] == cfg
    # traversal guard
    try:
        _req(port, "/api/config/save", {"name": "../evil", "config": {}})
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_board_eval_flow(board):
    """Evaluate tab: background MCQ eval on the fixture task."""
    port, root = board
    res = _req(
        port,
        "/api/eval",
        {
            "config_preset": "tiny",
            "dataset": "mcq_demo",
            "dataset_dir": "data",
            "n_shot": 2,
            "eval_batch_size": 2,
        },
    )
    assert res.get("ok"), res
    for _ in range(240):
        st = _req(port, "/api/eval/status")
        if st["state"] in ("done", "error"):
            break
        time.sleep(1)
    assert st["state"] == "done", st
    assert 0.0 <= st["results"]["accuracy"] <= 1.0


def test_board_chat_flow(board):
    """Chat tab: load a tiny model, send a message, get a reply."""
    port, root = board
    res = _req(
        port,
        "/api/chat/load",
        {"config_preset": "tiny", "template": "qwen2_vl"},
    )
    assert res.get("ok"), res
    for _ in range(240):
        st = _req(port, "/api/chat/status")
        if st["state"] in ("ready", "error"):
            break
        time.sleep(1)
    assert st["state"] == "ready", st
    out = _req(
        port,
        "/api/chat",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_new_tokens": 4,
        },
    )
    assert "content" in out, out


def test_board_export_flow(board, tmp_path):
    """Export tab: POST /api/export runs the HF-safetensors + Modelfile
    export in the background; status polls to done (reference LlamaBoard
    export tab)."""
    import os

    port, root = board
    out = f"{root}/export1"
    res = _req(
        port,
        "/api/export",
        {"config_preset": "tiny", "template": "qwen2_vl", "output_dir": out},
    )
    assert "error" not in res
    for _ in range(120):
        st = _req(port, "/api/export/status")
        if st["state"] in ("done", "error"):
            break
        time.sleep(1)
    assert st["state"] == "done", st
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    assert os.path.exists(os.path.join(out, "config.json"))
    assert "TEMPLATE" in open(os.path.join(out, "Modelfile")).read()


def test_board_checkpoints_endpoint(board):
    """/api/checkpoints lists a run's orbax step dirs (the LlamaBoard
    checkpoint dropdown role) and refuses paths outside the runs root."""
    import os

    port, root = board
    run = f"{root}/ckrun"
    os.makedirs(os.path.join(run, "checkpoints", "5"))
    os.makedirs(os.path.join(run, "checkpoints", "10"))
    res = _req(port, f"/api/checkpoints?run={run}")
    assert res["steps"] == [5, 10]
    try:
        _req(port, "/api/checkpoints?run=/etc")
        raise AssertionError("traversal not rejected")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_board_eval_predict_mode(board):
    """Evaluate tab 'predict' mode: SFT greedy predictions scored
    BLEU-4/ROUGE (predict_and_score through the board; LlamaBoard's
    Evaluate & Predict second half)."""
    port, root = board
    res = _req(
        port,
        "/api/eval",
        {
            "mode": "predict",
            "config_preset": "tiny",
            "dataset": "demo",
            "dataset_dir": "data",
            "cutoff_len": 32,
            "predict_samples": 2,
            "bf16": False,
            "output_dir": f"{root}/predict1",
        },
    )
    assert res.get("ok"), res
    for _ in range(240):
        st = _req(port, "/api/eval/status")
        if st["state"] in ("done", "error"):
            break
        time.sleep(1)
    assert st["state"] == "done", st
    assert "rouge-l" in st["results"] and st["results"]["samples"] > 0


def test_board_chat_image_and_system(board):
    """Chat tab multimodal turn: data-URI image + <image> marker + system
    prompt through /api/chat (LlamaBoard chat tab's image box role)."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    port, root = board
    res = _req(port, "/api/chat/load", {"config_preset": "tiny"})
    assert res.get("ok"), res
    for _ in range(240):
        st = _req(port, "/api/chat/status")
        if st["state"] in ("ready", "error"):
            break
        time.sleep(1)
    assert st["state"] == "ready", st
    img = Image.fromarray(
        (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    out = _req(
        port,
        "/api/chat",
        {
            "messages": [{"role": "user", "content": "<image>what is it"}],
            "images": [uri],
            "system": "You are a terse assistant.",
            "max_new_tokens": 4,
        },
    )
    assert "content" in out, out


def test_board_datasets_and_preview_command(board):
    """Round-3 additions: registry dataset listing (LlamaBoard list_datasets
    role) and the preview-command endpoint (runner gen_cmd role)."""
    port, _ = board
    ds = _req(port, "/api/datasets?dir=data")
    names = [d["name"] for d in ds["datasets"]]
    assert "demo" in names
    assert all("formatting" in d for d in ds["datasets"])
    # a missing registry dir degrades to an empty list, not an error
    assert _req(port, "/api/datasets?dir=/nonexistent") == {"datasets": []}
    cfg = {"stage": "sft", "dataset": "demo", "cutoff_len": 64, "bf16": True}
    prev = _req(port, "/api/preview", {"name": "t2", "config": cfg})
    assert "infinitevl_tpu.cli train" in prev["command"]
    assert "t2.yaml" in prev["command"]
    import yaml

    assert yaml.safe_load(prev["yaml"]) == cfg
