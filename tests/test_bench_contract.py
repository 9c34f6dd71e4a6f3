"""Driver contract for bench.py: exactly ONE parseable JSON line on stdout,
no matter what (CLAUDE.md; round-4 BENCH_r04.json was rc=124/parsed=null
because the old bench only printed after every section finished).

These tests exercise the real emission machinery:
  - in-process: emit() schema + idempotence;
  - subprocess: a full `python bench.py` run on the CPU backend with a
    zero section budget — every section must skip with explicit nulls and
    the single JSON line must still parse (the exact driver code path for
    a budget-exhausted run).
"""

import importlib.util
import json
import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # module level only: R dict + helpers
    return mod


def test_emit_idempotent_and_schema(capsys):
    bench = _load_bench()
    bench.emit("unit-test")
    first = capsys.readouterr().out.strip().splitlines()
    assert len(first) == 1
    obj = json.loads(first[0])
    # driver headline triple
    assert obj["metric"] == "streaming_prefill_fps_448"
    assert "value" in obj and "unit" in obj and "vs_baseline" in obj
    # every pre-seeded field survives a never-measured emit as explicit null
    for key in (
        "vs_dense_measured_maxctx", "vs_dense_measured_maxctx_int8_fair",
        "vs_dense_equal_hbm_batched", "fps_e2e", "decode_tok_s",
        "spec_tok_s_at_acc60", "floor_ms_bf16", "train_tok_s",
    ):
        assert key in obj and obj[key] is None
    assert obj["bench_emit_reason"] == "unit-test"
    # second call must print nothing (signal + atexit + watchdog can race)
    bench.emit("again")
    assert capsys.readouterr().out == ""


def test_bench_zero_budget_subprocess_emits_parseable_json():
    env = dict(os.environ)
    # CPU backend (sitecustomize is PYTHONPATH-injected; clearing it lets
    # JAX_PLATFORMS through — same recipe as tests/conftest.py's docstring)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["IVL_BENCH_BUDGET_S"] = "0"  # every section must est-gate skip
    env["IVL_COMPILE_CACHE"] = "0"
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, (proc.stdout, proc.stderr[-2000:])
    obj = json.loads(lines[0])
    assert obj["metric"] == "streaming_prefill_fps_448"
    assert obj["value"] is None  # nothing measured under a zero budget
    # all 14 sections skipped, listed by name
    assert "dense_and_fair" in obj["sections_skipped"]
    assert len(obj["sections_skipped"]) >= 14
    assert obj["bench_emit_reason"] == "end"
    assert proc.returncode == 0, proc.stderr[-2000:]
