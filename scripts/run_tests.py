"""Crash-isolated test driver: one pytest subprocess per test file.

Round-3 verdict "what's weak" #4: a single in-process run of the full
suite once died to a segfault inside XLA-CPU's `backend_compile_and_load`
(during tests/test_streaming.py::test_clip_step_duplicate_mode_tps2; the
file passes 10/10 in isolation — an XLA compiler flake under a long-lived
process, not a repo bug). One compiler crash must not take down the whole
run, so this driver shards the suite per file:

    python scripts/run_tests.py [-j N] [files...]

- each file runs in its own `python -X faulthandler -m pytest <file> -q`
  subprocess (faulthandler prints the native stack if a crash recurs —
  the repro artifact the round-3 verdict asked to capture);
- a file whose subprocess dies to a signal (rc < 0) is retried once in a
  fresh process before being reported as CRASHED;
- results aggregate into one summary; exit code 0 iff everything passed.

Serial by default (-j 1): the container has one CPU core and jit compiles
already saturate it; -j exists for multi-core machines.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_file(path: str) -> tuple[str, int, float, str]:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-X", "faulthandler", "-m", "pytest", path, "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    rc = proc.returncode
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-25:])
    if rc < 0:
        # killed by a signal (the XLA compiler-flake class): retry once in
        # a fresh process; keep the faulthandler trace from the first try
        crash_trace = tail
        proc = subprocess.run(
            [sys.executable, "-X", "faulthandler", "-m", "pytest", path, "-q"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        rc = proc.returncode
        tail = (
            f"[first attempt died with signal; faulthandler trace:]\n"
            f"{crash_trace}\n[retry:]\n"
            + "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-15:])
        )
    return path, rc, time.time() - t0, tail


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="test files (default: tests/*)")
    ap.add_argument("-j", type=int, default=1, help="parallel subprocesses")
    args = ap.parse_args(argv)
    files = args.files or sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))

    results = []
    if args.j > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(args.j) as ex:
            results = list(ex.map(run_file, files))
    else:
        for f in files:
            r = run_file(f)
            status = "ok" if r[1] == 0 else f"rc={r[1]}"
            print(f"{os.path.basename(r[0]):<34} {status:>8} {r[2]:6.0f}s",
                  flush=True)
            results.append(r)

    failed = [r for r in results if r[1] != 0]
    crashed = [r for r in results if r[1] < 0]
    print(f"\n{len(results) - len(failed)}/{len(results)} files passed")
    for path, rc, dt, tail in failed:
        label = "CRASHED" if rc < 0 else "FAILED"
        print(f"\n=== {label} {path} (rc={rc}) ===\n{tail}")
    if crashed:
        print(
            "\nsignal deaths above are the XLA-CPU compiler-flake class "
            "(see ROUND4_NOTES.md); the faulthandler trace is the repro "
            "artifact"
        )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
