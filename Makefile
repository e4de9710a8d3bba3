.PHONY: lint test test-tpu bench

lint:
	python -m flake8 rankfm_tpu/ --max-line-length=120 || true

test:
	python -m pytest tests/ -x -q

# TPU-gated tests (fused Mosaic kernel, Pallas scatter, scaled parity) on the
# real device — run every round via the verify drive
test-tpu:
	RANKFM_TPU_TEST_TPU=1 python -m pytest tests/test_fused.py \
		tests/test_scatter.py tests/test_parity.py -x -q

bench:
	python bench.py
