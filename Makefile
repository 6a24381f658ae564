# Developer entry points (reference ships a Makefile; CI parity lives in
# .github/workflows/test.yml)
.PHONY: test test-all bench bench-ess bench-northstar bench-directed clean

test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-ess:
	BENCH_MODE=ess python bench.py
	BENCH_MODE=ess-northstar python bench.py

bench-northstar:
	BENCH_MODE=northstar python bench.py

bench-directed:
	BENCH_MODE=directed python bench.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} +
	rm -rf .pytest_cache
