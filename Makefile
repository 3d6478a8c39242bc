# Test tiers ---------------------------------------------------------------
# fast tier (default; pytest.ini deselects @slow): all reference-golden,
# oracle and parity coverage. full tier adds DMFT loops + interpret-mode
# fused-kernel sweeps.
test:
	python -m pytest tests/ -q

test-full:
	python -m pytest tests/ -q -m ""

bench:
	python bench.py

# C API shared library (capi/Makefile builds libedipack_tpu_c.so + the
# reference-ABI compat layer)
capi:
	$(MAKE) -C edipack_tpu/capi

.PHONY: test test-full bench capi
