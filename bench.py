#!/usr/bin/env python
"""Headline benchmark: aggregate ESS/sec on the 1000-site ICAR lattice.

Configuration 4 of BASELINE.md (the north-star): 64 vmapped chains of the
logit/ICAR Gibbs sampler on a simulated 1000-site square-lattice dataset
(visit design matching the reference's own test dataset: 2-10 visits on
half the sites).

Metric: worst-parameter pooled bulk-ESS per second of sampling wall time
(min over all alpha/beta components, ESS pooled across all chains).
Baseline: the same metric from the single-core CPU floor — a faithful
numpy/scipy implementation of the reference's algorithm
(benchmarks/reference_floor.py), since the reference's Cython extensions
cannot be built in this image (BASELINE.md: floor must be measured, not
copied). The floor result is cached in benchmarks/floor_cache.json.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "ESS/sec", "vs_baseline": N}
Detail goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

BENCH = {
    'n': 1000,
    'ns': 500,
    'p': 3,
    'q': 3,
    'min_v': 2,
    'max_v': 10,
    'seed': 7,
    'chains': 64,
    'size': 3008,
    'burnin': 1024,
    'floor_chains': 4,
    'floor_size': 1500,
    'floor_burnin': 500,
}
CACHE = os.path.join(os.path.dirname(__file__), 'benchmarks',
                     'floor_cache.json')


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def min_ess_per_param(samples):
    """Min pooled bulk-ESS over all alpha/beta scalar components."""
    from occuspytial_tpu import diagnostics as dg

    vals = []
    for name in ('alpha', 'beta'):
        arr = samples[name]  # (chains, draws, dim)
        for j in range(arr.shape[2]):
            vals.append(dg.ess_bulk(arr[:, :, j]))
    return float(np.nanmin(vals))


def measure_floor(dataset):
    key = {k: BENCH[k] for k in
           ('n', 'ns', 'min_v', 'max_v', 'seed', 'floor_chains',
            'floor_size', 'floor_burnin')}
    if os.path.exists(CACHE):
        with open(CACHE) as fh:
            cached = json.load(fh)
        if cached.get('config') == key:
            log(f'floor: cached {cached["ess_per_sec"]:.3f} ESS/sec '
                f'({cached["iters_per_sec"]:.1f} it/s)')
            return cached
    from benchmarks.reference_floor import NumpyLogitICAR

    Q, W, X, y = dataset
    # Same estimator on both sides: pooled multi-chain rank-normalized
    # ESS. The floor runs its chains sequentially on one core (the
    # BASELINE.json comparator is single-core); wall time is the total.
    log('floor: running numpy reference-equivalent sampler (single core)…')
    s = NumpyLogitICAR(Q, W, X, y, random_state=BENCH['seed'])
    chains = []
    t0 = time.time()  # one-time construction excluded, like the TPU side
    for c in range(BENCH['floor_chains']):
        s.reset(BENCH['seed'] + c)
        chains.append(s.run(BENCH['floor_size'],
                            burnin=BENCH['floor_burnin']))
    wall = time.time() - t0
    samples = {
        k: np.stack([c[k] for c in chains]) for k in chains[0]
    }
    ess = min_ess_per_param(samples)
    total_iters = BENCH['floor_chains'] * BENCH['floor_size']
    res = {
        'config': key,
        'wall_sec': wall,
        'iters_per_sec': total_iters / wall,
        'min_ess': ess,
        'ess_per_sec': ess / wall,
        'beta_mean': samples['beta'].mean(axis=(0, 1)).tolist(),
        'alpha_mean': samples['alpha'].mean(axis=(0, 1)).tolist(),
    }
    with open(CACHE, 'w') as fh:
        json.dump(res, fh, indent=1)
    log(f'floor: {res["iters_per_sec"]:.1f} it/s over '
        f'{BENCH["floor_chains"]} sequential chains, pooled min ESS '
        f'{ess:.1f} in {wall:.1f}s -> {res["ess_per_sec"]:.3f} ESS/sec')
    return res


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.utils import make_data

    log(f'backend: {jax.default_backend()} ({jax.devices()[0]})')
    Q, W, X, y, alpha, beta, tau, z = make_data(
        n=BENCH['n'], ns=BENCH['ns'], p=BENCH['p'], q=BENCH['q'],
        min_v=BENCH['min_v'], max_v=BENCH['max_v'],
        random_state=BENCH['seed'],
    )

    floor = measure_floor((Q, W, X, y))

    t0 = time.time()
    s = LogitICARGibbs(Q, W, X, y, random_state=BENCH['seed'])
    log(f'construct: {time.time() - t0:.1f}s')

    # warmup: compile the scan executable (one-time, persistent-cached)
    t0 = time.time()
    s.sample(s.scan_chunk, chains=BENCH['chains'], progressbar=False)
    log(f'warmup (compile): {time.time() - t0:.1f}s')

    t0 = time.time()
    post = s.sample(
        BENCH['size'], burnin=BENCH['burnin'], chains=BENCH['chains'],
        progressbar=False,
    )
    wall = time.time() - t0
    iters_per_sec = BENCH['size'] / wall

    ess = min_ess_per_param(post.data)
    ess_per_sec = ess / wall
    vs = ess_per_sec / floor['ess_per_sec']

    log(f'tpu: {iters_per_sec:.1f} it/s x {BENCH["chains"]} chains '
        f'({iters_per_sec * BENCH["chains"]:.0f} chain-iters/s), '
        f'min pooled ESS {ess:.0f} in {wall:.1f}s')
    log(f'tpu beta mean:   {post["beta"].mean(axis=(0, 1))}')
    log(f'floor beta mean: {np.asarray(floor["beta_mean"])}')
    log(f'true beta:       {beta}')
    print(json.dumps({
        'metric': (
            'aggregate ESS/sec (min over alpha+beta, pooled over '
            f'{BENCH["chains"]} chains, LogitICARGibbs, 1000-site '
            'ICAR lattice) vs single-core CPU reference floor'
        ),
        'value': round(ess_per_sec, 3),
        'unit': 'ESS/sec',
        'vs_baseline': round(vs, 2),
    }))


if __name__ == '__main__':
    main()
