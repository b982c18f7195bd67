"""One-off headline tuning probe: kernel knobs on the config-4 problem.

Measures min-pooled-ESS/sec on the exact headline dataset/protocol
(bench.py HEAD) for a few sampler variants that leave the posterior
untouched (rng stream implementation, spatial sub-sweep count). Each
variant runs in its own subprocess — the tunneled TPU runtime tolerates
~2 sampling runs per process (see bench.py:bench_config).

Usage: python scripts/headline_tune.py            # sweep
       python scripts/headline_tune.py NAME       # worker mode
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

VARIANTS = {
    'base': {},  # NB: the shipped default is cg_iters=8 since 2026-08-20
    'rbg': {'rng_impl': 'rbg'},
    'sweeps3': {'spatial_sweeps': 3},
    'sweeps4': {'spatial_sweeps': 4},
    # CG-budget ladder (bf16 eigenbasis): the solver is ~50% of the
    # step (profile_step: default 942 it/s, cg8 1187 it/s), so a
    # smaller warm-started budget buys it/s directly IF the draws stay
    # unbiased — the sweep z-checks beta means against base.
    'cg15': {'cg_iters': 15},  # the round-2 default
    'cg12': {'cg_iters': 12},
    'cg10': {'cg_iters': 10},
    'cg8': {'cg_iters': 8},
    'cg6': {'cg_iters': 6},
    'cg8s4': {'cg_iters': 8, 'spatial_sweeps': 4},
    'cg10s4': {'cg_iters': 10, 'spatial_sweeps': 4},
    # tau-ridge robustness: the ASIS tau move as a slice sampler —
    # the 12-step MH random walk (sd 1.2) cannot traverse the ~11
    # log-tau units back out of a tau ~ 1e-3 degenerate-ridge
    # excursion (seen as chain 17 of cg10:seed9, tau_min 8e-4, ESS 6)
    'slice': {'asis_method': 'slice'},
    'cg10slice': {'cg_iters': 10, 'asis_method': 'slice'},
}

#: sweep mode: variant x seed grid ("VARIANT:SEED" worker args)
SWEEP = [
    f'{v}:{s}'
    for v in ('cg15', 'cg8', 'cg10', 'cg8s4')
    for s in (7, 8, 9)
]


def run_variant(name):
    import jax

    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.jax_cache'),
    )
    import numpy as np

    from bench import HEAD, min_ess_per_param
    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.utils import make_data

    name, _, seed = name.partition(':')
    seed = int(seed) if seed else HEAD['seed']
    Q, W, X, y, *_ = make_data(
        n=HEAD['n'], ns=HEAD['ns'], p=HEAD['p'], q=HEAD['q'],
        min_v=HEAD['min_v'], max_v=HEAD['max_v'],
        random_state=HEAD['seed'],
    )
    opts = dict(VARIANTS[name])
    rng_impl = opts.pop('rng_impl', None)
    s = LogitICARGibbs(Q, W, X, y, random_state=seed, **opts)
    if rng_impl:
        s.rng_impl = rng_impl
    s.scan_chunk = HEAD['size']
    s.sample(HEAD['size'], chains=HEAD['chains'], progressbar=False)
    t0 = time.time()
    post = s.sample(
        HEAD['size'], burnin=HEAD['burnin'], chains=HEAD['chains'],
        progressbar=False,
    )
    wall = time.time() - t0
    ess = min_ess_per_param(post.data)
    print(json.dumps({
        'variant': name,
        'seed': seed,
        'it_per_sec': round(HEAD['size'] / wall, 1),
        'min_pooled_ess': round(ess, 1),
        'ess_per_sec': round(ess / wall, 1),
        'beta_mean': np.round(
            post['beta'].mean(axis=(0, 1)), 4
        ).tolist(),
    }), flush=True)


def main():
    from bench import tunnel_ping

    here = os.path.dirname(os.path.abspath(__file__))
    for name in SWEEP:
        for attempt in range(2):
            # a wedged relay hangs a worker at first device sync and
            # the watchdog kill then wedges the relay FURTHER (killed
            # claims drain slowly) — probe with a tiny ping first and
            # wait out the drain instead of feeding it more corpses
            waited = 0
            while not tunnel_ping() and waited < 900:
                sys.stderr.write(f'{name}: tunnel wedged; waiting 30s\n')
                time.sleep(30)
                waited += 75
            try:
                r = subprocess.run(
                    [sys.executable,
                     os.path.join(here, 'headline_tune.py'), name],
                    capture_output=True, text=True, timeout=420,
                )
            except subprocess.TimeoutExpired:
                # a wedged device-tunnel session: skip to a fresh process
                sys.stderr.write(f'{name}: attempt {attempt} timed out\n')
                continue
            out = r.stdout.strip().splitlines()
            if r.returncode == 0 and out:
                print(out[-1], flush=True)
                break
            sys.stderr.write(
                f'{name}: attempt {attempt} rc={r.returncode}\n'
                f'{r.stderr[-500:]}\n'
            )


if __name__ == '__main__':
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        main()
