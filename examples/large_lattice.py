"""Large-lattice workflow: the matrix-free O(n) path at 10,000+ sites.

At this scale a dense spatial precision would cost 400MB+ and an
eigendecomposition minutes; declaring the lattice instead switches the
sampler to the stencil solver — O(n) setup, matrix-free matvecs, a
DCT-symbol preconditioner — and nothing else about the API changes.

The same path scales near-linearly to 100k+ sites on one chip:
measured 2026-08-20 on one TPU v5e, a 320x320 lattice (102,400 sites,
20,000 surveyed) samples 8 chains at 61.5 it/s with solver residual
3e-6 after a 12 s setup — swap ROWS = COLS = 320, ns = 20000 below to
reproduce (see docs/design.md for the measurement).

Run with:  python examples/large_lattice.py
(~1 minute including one-time compilation; fastest on TPU.)
"""

import numpy as np

from occuspytial_tpu import LogitICARGibbs
from occuspytial_tpu.ops.icar import lattice_precision
from occuspytial_tpu.utils import get_generator

ROWS, COLS, NEIGHBORS = 100, 100, 8
N = ROWS * COLS
N_SURVEYED = 5000

# -- simulate directly on the declared lattice -------------------------- #
rng = get_generator(11)
Q = lattice_precision(ROWS, COLS, NEIGHBORS).astype(float)
X = rng.uniform(-2, 2, (N, 3))
X[:, 0] = 1.0
beta_true = np.array([0.8, 1.5, -1.0])
alpha_true = np.array([1.2, -0.5, 0.7])
psi = 1.0 / (1.0 + np.exp(-(X @ beta_true)))
z = rng.binomial(1, psi)
sites = rng.choice(N, N_SURVEYED, replace=False)
W, y = {}, {}
for s in sites:
    v = int(rng.integers(2, 5, endpoint=True))
    w = rng.uniform(-2, 2, (v, 3))
    w[:, 0] = 1.0
    d = 1.0 / (1.0 + np.exp(-(w @ alpha_true)))
    W[int(s)] = w
    y[int(s)] = rng.binomial(1, z[s] * d)

# -- fit: `lattice=` activates the matrix-free solver ------------------- #
sampler = LogitICARGibbs(
    Q, W, X, y, random_state=11, lattice=(ROWS, COLS, NEIGHBORS),
)
post = sampler.sample(1024, burnin=256, chains=16, progressbar=True)

print(post.summary.round(3).to_string())
print(f'\ntrue beta:  {beta_true}')
print(f'true alpha: {alpha_true}')

# the residual diagnostic quantifies the fixed-budget CG solve
print(f'\neta solver max relative residual: '
      f'{sampler.solver_residual():.2e}')
