# Dev tooling (reference Makefile equivalent: check/test/dist targets).
# No venv target — dependencies are preinstalled (jax/optax/numpy/pytest).

.PHONY: check test bench native dist clean

check:
	scripts/check-code.sh

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	mkdir -p native/build
	g++ -O3 -fopenmp -shared -fPIC native/mas.cpp -o native/build/libmas.so

dist:
	python -m pip wheel --no-deps --no-build-isolation -w dist .

clean:
	rm -rf dist build *.egg-info native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
