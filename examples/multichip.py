"""Multi-device scaling: chains-parallel and 2-D (chains x sites) SPMD.

Two ways to use more than one chip with the identical sampler API:

1. ``sample_parallel`` — chains sharded over a 1-D mesh (the common
   case: chains are independent, so the program has no collectives);
2. ``sample_parallel_2d`` — for lattices too large for one chip, the
   FULL Gibbs step is additionally partitioned over a ``'sites'`` mesh
   axis: GSPMD inserts the halo exchanges the stencil matvecs imply.

Run with:  python examples/multichip.py
On a machine without 8 real devices this forces a virtual 8-device CPU
mesh — the sharding program is identical either way.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax
import numpy as np
from jax.sharding import Mesh

# Decide the backend BEFORE any device is touched: probing jax.devices()
# initializes the platform (and on a tunneled TPU runtime can block
# while another process holds the chip), after which the platform can
# no longer be switched. Opt in to real multi-chip hardware explicitly.
if os.environ.get('OCCU_MULTICHIP_REAL') != '1':
    jax.config.update('jax_platforms', 'cpu')

from occuspytial_tpu import LogitICARGibbs
from occuspytial_tpu.parallel import (
    chain_mesh,
    sample_parallel,
    sample_parallel_2d,
)
from occuspytial_tpu.utils import get_generator, rand_precision_mat

ROWS, COLS = 16, 10
N = ROWS * COLS

# -- simulate a lattice survey ---------------------------------------- #
rng = get_generator(3)
Q = rand_precision_mat(ROWS, COLS).astype(float)
X = rng.uniform(-2, 2, (N, 3))
X[:, 0] = 1
beta_true = np.array([-0.5, 1.0, 0.5])
z = rng.binomial(1, 1 / (1 + np.exp(-(X @ beta_true))))
W, y = {}, {}
for s in rng.choice(N, N // 2, replace=False):
    v = int(rng.integers(2, 6))
    W[int(s)] = np.column_stack([np.ones(v), rng.uniform(-2, 2, v)])
    y[int(s)] = rng.binomial(1, z[s] * 0.7, v)


def model():
    return LogitICARGibbs(
        Q, W, X, y, random_state=3, lattice=(ROWS, COLS, 8),
    )


# -- 1-D: chains over all 8 devices ----------------------------------- #
post = sample_parallel(model(), 600, burnin=200, chains=16,
                       mesh=chain_mesh())
print('chains-DP posterior (16 chains over 8 devices):')
print(post.summary.loc[['beta[0]', 'beta[1]', 'beta[2]']])

# -- 2-D: 4 chain shards x 2 site shards ------------------------------ #
mesh2 = Mesh(np.asarray(jax.devices()).reshape(4, 2),
             axis_names=('chains', 'sites'))
post2 = sample_parallel_2d(model(), 600, mesh2, burnin=200, chains=4)
print('\n2-D (chains x sites) posterior (site axis split in row bands):')
print(post2.summary.loc[['beta[0]', 'beta[1]', 'beta[2]']])
print('\ntrue beta:', beta_true)
