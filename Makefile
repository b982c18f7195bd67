# Local equivalents of the CI pipeline (.github/workflows/ci.yml); this
# image has no network, so `make check` is the runnable record.

.PHONY: check lint test tpu-check bench wheels

lint:
	python scripts/lint.py

test:
	python -m pytest tests/ -q

check: lint test

# validates the default TPU sampler path on real hardware (TPU_CHECK.log)
tpu-check:
	python scripts/tpu_check.py

bench:
	python bench.py

# binary wheels (requires network + cibuildwheel; see the script header)
wheels:
	bash scripts/build_wheels.sh
