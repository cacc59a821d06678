# Mirrors the reference Makefile (fmt / clippy / test, Makefile:23-24).
PY ?= python

.PHONY: test test-fast lint fmt bench native audit

# -n 2: two xdist workers - besides wall-clock, this CONTAINS a known
# XLA:CPU compiler segfault that only manifests ~160 compiled programs deep
# into a single long-lived process (worker crashes surface as test failures
# and the run continues; serial runs die mid-suite with no summary).
test:
	$(PY) -m pytest tests/ -q -n 2
	# MANDATORY: the production-FRI-config e2e (84 queries, 16 PoW bits) -
	# the only continuous coverage of production opening shapes
	$(PY) -m pytest tests/test_debug_and_adversarial.py::test_full_production_fri_config -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q --ignore=tests/test_e2e.py --ignore=tests/test_sharded.py --ignore=tests/test_debug_and_adversarial.py

lint:
	ruff check zkvm_brainfuck_tpu tests tools bench.py

fmt:
	ruff format zkvm_brainfuck_tpu tests tools bench.py

bench:
	$(PY) bench.py

native:
	$(MAKE) -C zkvm_brainfuck_tpu/core/native

audit:
	$(PY) tools/graph_audit.py
