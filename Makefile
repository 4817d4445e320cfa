PY ?= python

.PHONY: test bench benches native clean entrycheck

native:
	$(MAKE) -C native

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

benches:
	$(PY) benches/run_benches.py --suite all

entrycheck:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) __graft_entry__.py

clean:
	$(MAKE) -C native clean
	rm -rf stark_tpu/__pycache__ stark_tpu/*/__pycache__ tests/__pycache__
