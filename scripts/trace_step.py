"""Capture a jax.profiler trace of the headline sampling run."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update(
    'jax_compilation_cache_dir',
    os.path.join(os.path.dirname(__file__), '..', '.jax_cache'),
)

from occuspytial_tpu import LogitICARGibbs  # noqa: E402
from occuspytial_tpu.utils import make_data  # noqa: E402

Q, W, X, y, *_ = make_data(
    n=1000, ns=500, p=3, q=3, min_v=2, max_v=10, random_state=7
)
s = LogitICARGibbs(Q, W, X, y, random_state=1)
s.scan_chunk = 128
s.sample(128, burnin=0, chains=64, progressbar=False)  # warm compile

with jax.profiler.trace('/tmp/jax_trace'):
    s.sample(256, burnin=0, chains=64, progressbar=False)
print('trace done')
