"""Irregular spatial graphs: occupancy on a county-style adjacency.

Real survey regions are rarely rectangular lattices — they are county,
watershed or habitat-patch maps with irregular neighbor structure. Pass
the sparse ICAR precision built from ANY adjacency and the sampler
auto-selects the matrix-free graph solver (padded neighbor-list
gathers + deflated-Jacobi CG, ops/graph.py): no dense Q, no
eigendecomposition, no lattice assumption.

Here the map is a Delaunay triangulation of random site locations —
every site's neighbor count differs.

Run with:  python examples/irregular_graph.py

Measured on one TPU v5e (2026-08-20): recovers alpha (0.90, -0.51) vs
true (1.0, -0.6) and beta (0.19, 1.18, -0.75) vs true (0.4, 1.2, -0.8)
within their 94% HDIs, R-hat <= 1.005 on every parameter, eta-solver
cold residual 2.0e-3 at the auto-selected deflation rank.
"""

import numpy as np
import scipy.sparse as sps
from scipy.spatial import Delaunay

from occuspytial_tpu import LogitICARGibbs
from occuspytial_tpu.utils import get_generator

N = 1500
N_SURVEYED = 800

# -- an irregular adjacency from random site locations ------------------ #
rng = get_generator(4)
pts = rng.uniform(0, 1, (N, 2))
tri = Delaunay(pts)
rows, cols = [], []
for simplex in tri.simplices:
    for a in range(3):
        i, j = simplex[a], simplex[(a + 1) % 3]
        rows += [i, j]
        cols += [j, i]
adj = sps.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(N, N))
adj = sps.csr_matrix((adj.tocsr() > 0).astype(float))
deg = np.asarray(adj.sum(axis=1)).ravel()
Q = (sps.diags(deg) - adj).tocsr()          # singular ICAR precision

# -- simulate a survey on that graph ------------------------------------ #
X = rng.uniform(-2, 2, (N, 3))
X[:, 0] = 1.0
beta_true = np.array([0.4, 1.2, -0.8])
alpha_true = np.array([1.0, -0.6])
psi = 1.0 / (1.0 + np.exp(-(X @ beta_true)))
z = rng.binomial(1, psi)
W, y = {}, {}
for s in rng.choice(N, N_SURVEYED, replace=False):
    v = int(rng.integers(2, 6))
    W[int(s)] = np.column_stack([np.ones(v), rng.uniform(-2, 2, v)])
    d = 1.0 / (1.0 + np.exp(-(W[int(s)] @ alpha_true)))
    y[int(s)] = rng.binomial(1, z[s] * d)

# -- sample: sparse Q + irregular graph, same API ----------------------- #
sampler = LogitICARGibbs(Q, W, X, y, random_state=4, solver='graph')
print(f'solver: {sampler.solver}  '
      f'(n={sampler.graph.n}, max degree {sampler.graph.k_max}, '
      f'{sampler.graph.n_edges} edges, deflation rank '
      f'{sampler.graph.deflate})')
post = sampler.sample(2000, burnin=1000, chains=4)
print(post.summary.loc[['alpha[0]', 'alpha[1]',
                        'beta[0]', 'beta[1]', 'beta[2]']])
print('\ntrue alpha:', alpha_true, ' true beta:', beta_true)
print('eta solver cold-start residual:', f'{sampler.solver_residual():.1e}')
