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
    assert "training board" in html
    st = _req(port, "/api/status")
    assert st == {"running": False}


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
