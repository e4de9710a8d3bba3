.PHONY: lint test bench

lint:
	python -m flake8 rankfm_tpu/ --max-line-length=120 || true

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py
