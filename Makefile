# Mirrors the reference's Makefile targets (build/test/perf/trace) for the
# TPU-native framework. `make trace` is the analogue of the reference's
# `make mactrace` (dotnet-trace -> speedscope): it writes a jax.profiler
# trace viewable in TensorBoard/XProf.

PYTHON ?= python

.PHONY: test perf trace lint

test:
	$(PYTHON) -m pytest tests/ -q

perf:
	$(PYTHON) bench.py

trace:
	$(PYTHON) bench.py --profile /tmp/sdfkit_tpu_trace
	@echo "trace written; view with: tensorboard --logdir /tmp/sdfkit_tpu_trace"

lint:
	$(PYTHON) -m compileall -q sdfkit_tpu tests bench.py __graft_entry__.py
