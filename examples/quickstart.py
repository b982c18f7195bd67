"""Quickstart: simulate data, fit all four samplers, compare posteriors.

Run with:  python examples/quickstart.py
(~1-2 minutes including one-time compilation; fastest on TPU.)
"""

import numpy as np

from occuspytial_tpu import (
    LogitICARGibbs,
    LogitRSRGibbs,
    ProbitICARGibbs,
    ProbitRSRGibbs,
)
from occuspytial_tpu.utils import make_data

# -- simulate a 1000-site occupancy dataset on a random lattice -------- #
Q, W, X, y, alpha, beta, tau, z = make_data(
    n=1000, ns=500, p=3, q=3, min_v=2, max_v=10, random_state=1,
)
print(f'true alpha: {np.round(alpha, 3)}')
print(f'true beta:  {np.round(beta, 3)}')

# -- fit ---------------------------------------------------------------- #
for cls in (LogitICARGibbs, LogitRSRGibbs, ProbitRSRGibbs,
            ProbitICARGibbs):
    sampler = cls(Q, W, X, y, random_state=1)
    post = sampler.sample(2000, burnin=1000, chains=8, progressbar=True)
    sm = post.summary
    print(f'\n=== {cls.__name__} ===')
    print(sm.round(3).to_string())

# -- checkpoint / resume ------------------------------------------------ #
sampler = LogitRSRGibbs(Q, W, X, y, random_state=1)
post1 = sampler.sample(500, chains=8, progressbar=False)
sampler.save_carry('/tmp/occu_ckpt.npz', sampler.final_carry)
carry = sampler.load_carry('/tmp/occu_ckpt.npz')
post2 = sampler.sample(500, resume_from=carry, progressbar=False)
print('\nresumed run continues the chain exactly:',
      post2['tau'].shape)
