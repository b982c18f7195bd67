"""Sweep the graph-path (graph_rank, cg_iters) grid at 10k sites.

VERDICT r3 next-round #4: config 5g (arbitrary-graph matrix-free CG,
ops/graph.py) measured 213 ESS/s against the lattice stencil's 398 on
the identical 10k-site problem. The graph CG's cost is ~linear in its
iteration budget (banded panel re-streams dominate: 3 x 15.5 MB per
matvec at this size), so the lever is trading a stronger deflation
basis (one-time host Lanczos, rank m) for a smaller fixed budget.

For every grid point this measures, through the REAL sampler:
  - iters/sec and worst-parameter pooled ESS/sec (the judged metric),
  - the in-run residual max over every solve of the whole run
    (``state['solver_resid']`` — the mid-run health monitor), which is
    the accuracy evidence that a lower budget is actually safe.

Usage: python scripts/graph_sweep.py [rank,iters ...]
       (no args: full default grid; each config in-process, one run)
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

GRID_RANKS = (64, 128, 256)
GRID_ITERS = (12, 16, 24)

SIZE, BURNIN, CHAINS = 1024, 128, 16


def main():
    import jax

    import numpy as np
    import scipy.sparse as sps

    from bench import _cache_dir, make_lattice_dataset, min_ess_per_param

    # _cache_dir fingerprints jax/jaxlib + the live backend's platform
    # version, so stale entries from another runtime can never be read
    # back (the failure bench.py's versioned dir exists to prevent);
    # first device contact must happen before the fingerprint is taken.
    jax.devices()
    jax.config.update('jax_compilation_cache_dir', _cache_dir())
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    from occuspytial_tpu import LogitICARGibbs

    if len(sys.argv) > 1:
        grid = []
        for arg in sys.argv[1:]:
            r, i = arg.split(',')
            grid.append((int(r), int(i)))
    else:
        grid = [(r, i) for r in GRID_RANKS for i in GRID_ITERS]

    Q5, W5, X5, y5, *_ = make_lattice_dataset(
        100, 100, ns=5000, seed=11, min_v=2, max_v=5,
    )
    Qs = sps.csr_matrix(Q5)
    rows = []
    for rank, iters in grid:
        t0 = time.time()
        s = LogitICARGibbs(
            Qs, W5, X5, y5, random_state=11, solver='graph',
            cg_iters=iters, graph_rank=rank, solver_check_tol=None,
        )
        s.scan_chunk = SIZE
        build_s = time.time() - t0
        try:
            t0 = time.time()
            s.sample(SIZE, chains=CHAINS, progressbar=False)
            warm_s = time.time() - t0
            t0 = time.time()
            post = s.sample(SIZE, burnin=BURNIN, chains=CHAINS,
                            progressbar=False)
            wall = time.time() - t0
        except Exception as exc:
            print(f'rank={rank} iters={iters}: FAILED {exc!r}',
                  flush=True)
            continue
        ess = min_ess_per_param(post.data)
        row = {
            'rank': rank, 'iters': iters,
            'build_s': round(build_s, 1), 'warm_s': round(warm_s, 1),
            'iters_per_sec': round(SIZE / wall, 2),
            'min_pooled_ess': round(ess, 1),
            'ess_per_sec': round(ess / wall, 2),
            'run_resid_max': round(float(s.last_solver_resid), 6),
            'beta_mean': np.round(
                post['beta'].mean(axis=(0, 1)), 4
            ).tolist(),
        }
        rows.append(row)
        print('ROW ' + json.dumps(row), flush=True)
    print(json.dumps(rows, indent=1))


if __name__ == '__main__':
    main()
