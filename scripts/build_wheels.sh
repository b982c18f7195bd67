#!/usr/bin/env bash
# Binary-wheel pipeline (parity with the reference's build-wheels.sh
# manylinux matrix, reference Makefile:17-27). The only native piece is
# the optional _packer C++ extension, so wheels are built per
# CPython ABI with cibuildwheel; `make wheels` is the entry point.
#
# Not runnable inside the zero-egress build image (no docker, no pip
# index) — this script plus the [tool.cibuildwheel] table in
# pyproject.toml are the committed, CI-consumable pipeline definition.
set -euo pipefail

cd "$(dirname "$0")/.."

# pure-python wheel always works (the native packer is optional and the
# package falls back to the numpy packer at import time)
python -m build --sdist --wheel --outdir dist/

# binary wheels with the compiled packer, one per ABI / platform
if command -v cibuildwheel >/dev/null 2>&1; then
    CIBW_BUILD='cp310-* cp311-* cp312-*' \
    CIBW_SKIP='*-musllinux_i686' \
    cibuildwheel --output-dir dist/
else
    echo "cibuildwheel not installed; built the pure wheel only" >&2
fi

ls -l dist/
