"""Pooled-ESS/sec vs chain count for the non-pinned bench configs.

BASELINE.json pins 64 chains only for the headline (config 4) and 1
chain for config 1; configs 2/2b/3 are free to pick the chain count
that maximizes aggregate ESS/sec on the chip. This measures it/s and
pooled worst-parameter ESS at several counts (each in its own
subprocess — axon tunnel tolerates ~2 sampling runs per process).

Usage: python scripts/chain_scaling.py            # run the sweep
       python scripts/chain_scaling.py CFG CHAINS # worker mode
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP = {
    'probit_icar': (64, 128, 256, 512, 1024),
    'probit_rsr': (64, 256, 512),
    'logit_rsr': (64, 128, 256),
}
SIZE = {'probit_icar': 2048, 'probit_rsr': 2048, 'logit_rsr': 3008}
BURN = {'probit_icar': 1024, 'probit_rsr': 1024, 'logit_rsr': 1024}


def build(cfg):
    from occuspytial_tpu import (
        LogitRSRGibbs,
        ProbitICARGibbs,
        ProbitRSRGibbs,
    )
    from occuspytial_tpu.utils import make_data

    if cfg.startswith('probit'):
        from bench import make_lattice_dataset

        Q, W, X, y, *_ = make_lattice_dataset(10, 10, ns=50, seed=3)
        cls = ProbitICARGibbs if cfg == 'probit_icar' else ProbitRSRGibbs
        return cls(Q, W, X, y, random_state=3)
    Q, W, X, y, *_ = make_data(
        n=1000, ns=500, p=3, q=3, min_v=2, max_v=10, random_state=7
    )
    return LogitRSRGibbs(Q, W, X, y, q=100, random_state=1)


def worker(cfg, chains):
    import jax
    import numpy as np

    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(__file__), '..', '.jax_cache'),
    )
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from bench import min_ess_per_param

    sampler = build(cfg)
    size, burn = SIZE[cfg], BURN[cfg]
    sampler.scan_chunk = size  # single dispatch through the tunnel
    sampler.sample(size, burnin=0, chains=chains, progressbar=False)
    t0 = time.perf_counter()
    post = sampler.sample(
        size, burnin=burn, chains=chains, progressbar=False
    )
    wall = time.perf_counter() - t0
    del np
    ess_min = min_ess_per_param(post.data)
    print(
        f'RESULT {cfg:12s} chains={chains:4d} {size / wall:7.1f} it/s '
        f'pooled_min_ess={ess_min:9.1f} ess/s={ess_min / wall:9.2f}'
    )


if __name__ == '__main__':
    if len(sys.argv) > 2:
        worker(sys.argv[1], int(sys.argv[2]))
    else:
        for cfg, counts in SWEEP.items():
            for c in counts:
                p = subprocess.run(
                    [sys.executable, __file__, cfg, str(c)],
                    capture_output=True, text=True, timeout=1800,
                )
                for ln in p.stdout.splitlines():
                    if ln.startswith('RESULT'):
                        print(ln)
                if p.returncode != 0:
                    print(f'{cfg}@{c}: FAILED\n{p.stderr[-400:]}')
