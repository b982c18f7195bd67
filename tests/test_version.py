"""Version metadata parity.

Mirrors the reference's meta test
(/root/reference/occuspytial/tests/test_version.py), which pins
``__version__`` against the build metadata so a release can never ship
with a stale package version string.  The reference also pins the
sphinx ``docs.conf.release``; this rebuild's docs are plain markdown
with no version field, so the pyproject pin is the full contract.
"""

import os
import re

import occuspytial_tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_version_matches_pyproject():
    with open(os.path.join(REPO, 'pyproject.toml')) as fh:
        text = fh.read()
    match = re.search(
        r'^version\s*=\s*["\']([^"\']+)["\']', text, re.MULTILINE
    )
    assert match is not None, 'pyproject.toml has no version field'
    assert occuspytial_tpu.__version__ == match.group(1)
