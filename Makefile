# cgx build/test/bench targets (the reference drives everything through a
# Makefile too — Makefile:7-30 — so the muscle memory carries over).

PY ?= python

.PHONY: all test test-fast bench bench-quick native dryrun clean

all: native test

native:
	$(PY) -c "from cgx.native import lib; import sys; sys.exit(0 if lib() else 1)" \
	  && echo "native: OK" || echo "native: unavailable (pure-Python fallbacks active)"

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not reference_binary"

# Kernel tests through the TPU interpreter (TPU-shaped semantics without
# hardware; catches what plain interpret=True hides).
test-tpu-interpret:
	CGX_TPU_INTERPRET=1 $(PY) -m pytest tests/test_kernels.py tests/test_ir.py tests/test_semiresident.py tests/test_wbell.py -q

bench:
	$(PY) bench.py

bench-quick:
	$(PY) bench.py --quick

dryrun:
	$(PY) __graft_entry__.py dryrun 8

clean:
	rm -rf .pytest_cache cgx/native/_cgx_native.so $$(find . -name __pycache__ -type d)
