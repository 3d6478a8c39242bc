# Test tiers ---------------------------------------------------------------
# fast tier (default; pytest.ini deselects @slow): all reference-golden,
# oracle and parity coverage. full tier adds DMFT loops + interpret-mode
# fused-kernel sweeps.
test:
	python -m pytest tests/ -q

# the slow tier runs ONE pytest process PER FILE: this jaxlib build
# segfaults when hundreds of live compiled executables accumulate in a
# single process (each slow file passes in isolation)
test-full: test
	for f in $$(grep -rl "pytest.mark.slow" tests/*.py); do \
	  echo "== $$f"; python -m pytest $$f -q -m slow || exit 1; \
	done

bench:
	python bench.py

# C API shared library (capi/Makefile builds libedipack_tpu_c.so + the
# reference-ABI compat layer)
capi:
	$(MAKE) -C edipack_tpu/capi

# runnable examples (Bethe DMFT loop; Python + reference-ABI C driver)
examples: capi
	cd examples/python && PYTHONPATH=../.. python hm_bethe.py nloop=3
	$(MAKE) -C examples/c
	cd examples/c && PYTHONPATH=../.. EDIPACK_TPU_PLATFORM=cpu ./hm_bethe

.PHONY: test test-full bench capi examples
