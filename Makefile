# Mirrors the reference Makefile (fmt / clippy / test, Makefile:23-24).
PY ?= python

.PHONY: test test-fast lint fmt bench native audit

# -n 2: two xdist workers, purely for wall-clock.  The long-standing
# mid-suite segfaults were XLA:CPU persistent-cache DESERIALIZATION crashes
# (round-5 root-cause; reproduced with fresh caches, matching machine
# features, and an AVX2 ISA cap) - fixed by disabling the CPU persistent
# compilation cache (utils/jax_setup.py; ZKBF_CPU_CACHE=1 re-enables).
test:
	$(PY) -m pytest tests/ -q -n 2 --dist loadfile
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
