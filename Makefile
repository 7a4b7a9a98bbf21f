# Dev tooling (reference Makefile equivalent: check/test/dist targets).
# No venv target — dependencies are preinstalled (jax/optax/numpy/pytest).

.PHONY: check test test-all bench native dist clean validate-tpu

check:
	scripts/check-code.sh

# Fast tier: skips @pytest.mark.slow (interpret-mode Pallas kernel sweeps,
# 8-device-mesh + subprocess CLI/multihost tests; 179 of 234 tests remain).
# Measured 2026-08-19 per-file serial: fast tier ~9.5 min serial (~3.5 min
# with -n 4 on 4 cores); slow tier adds ~18 min serial (block_fuse 236 s,
# multihost 250 s, parallel 318 s, encoder_fuse 127 s, cli_multidevice
# 80 s, kernel_mesh 79 s).
# xdist workers scale with the machine: min(4, cpu_count); a 1-core box
# runs plain pytest (xdist on 1 CPU only adds IPC overhead — measured
# 15 min for the fast tier vs ~10 serial).
NPROC := $(shell python -c 'import os; print(min(4, os.cpu_count() or 1))')
XDIST := $(if $(filter 1,$(NPROC)),,-n $(NPROC))
test:
	python -m pytest tests/ -q -m "not slow" $(XDIST)

# Everything, parallelized with pytest-xdist where cores allow.
test-all:
	python -m pytest tests/ -q $(XDIST)

bench:
	python bench.py

# On-chip validation in one command: in-kernel dropout tests + fuse A/Bs +
# headline bench shapes + a 200-step convergence smoke; writes one JSON
# evidence file to docs/evidence/validate_tpu_<date>.json.
validate-tpu:
	python scripts/tpu-validate-kernels.py

native:
	mkdir -p native/build
	g++ -O3 -fopenmp -shared -fPIC native/mas.cpp -o native/build/libmas.so

dist:
	python -m pip wheel --no-deps --no-build-isolation -w dist .

clean:
	rm -rf dist build *.egg-info native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
