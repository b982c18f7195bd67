# Local equivalents of the CI pipeline (.github/workflows/ci.yml); this
# image has no network, so `make check` is the runnable record.

.PHONY: check lint test tpu-check bench wheels

lint:
	python scripts/lint.py

test:
	python -m pytest tests/ -q

check: lint test

# `make check` with the evidence stamped by the commit it certifies and
# written to CHECK.log (the per-round committed record)
check-log:
	@{ echo "HEAD: $$(git rev-parse HEAD)  ($$(date -u +%FT%TZ))"; \
	python scripts/lint.py; echo "lint rc=$$?"; \
	python -m pytest tests/ -q; echo "pytest rc=$$?"; } 2>&1 | tee CHECK.log

# validates the default TPU sampler path on real hardware (TPU_CHECK.log)
tpu-check:
	python scripts/tpu_check.py

bench:
	python bench.py

# binary wheels (requires network + cibuildwheel; see the script header)
wheels:
	bash scripts/build_wheels.sh
