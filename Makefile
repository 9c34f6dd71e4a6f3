# `make test` runs the suite crash-isolated: one pytest subprocess per test
# file (scripts/run_tests.py), so an XLA-CPU compiler flake in one file
# cannot take down the run. `make test-fast` is the plain in-process suite.
.PHONY: test test-fast
test:
	python scripts/run_tests.py

test-fast:
	python -m pytest tests/ -x -q
