"""Measure headline-config (bench config 4) variants on the real chip.

Each variant runs in its own process (the axon runtime poisons a
process after a few dozen dispatches — see docs/design.md). Reports the
judged metric (worst-parameter pooled ESS/sec over 64 chains) plus the
in-run solver-residual max, so a tighter CG budget's safety is measured
rather than assumed.

Usage: python scripts/headline_sweep.py cg_iters[,sweeps[,rng]] ...
       e.g. python scripts/headline_sweep.py 6 8 6,3,rbg
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import jax

    import numpy as np

    from bench import HEAD, _cache_dir, min_ess_per_param

    # Versioned cache dir (jax/jaxlib + backend platform fingerprint) —
    # the hardcoded unversioned dir this replaced is exactly the
    # stale-cache poisoning failure bench._cache_dir() was built to fix.
    jax.devices()
    jax.config.update('jax_compilation_cache_dir', _cache_dir())
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.utils import make_data

    variants = []
    for arg in sys.argv[1:]:
        parts = arg.split(',')
        cg = int(parts[0])
        sweeps = int(parts[1]) if len(parts) > 1 else None
        rng = parts[2] if len(parts) > 2 else 'threefry2x32'
        variants.append((cg, sweeps, rng))

    Qh, Wh, Xh, yh, *_ = make_data(
        n=HEAD['n'], ns=HEAD['ns'], p=HEAD['p'], q=HEAD['q'],
        min_v=HEAD['min_v'], max_v=HEAD['max_v'],
        random_state=HEAD['seed'],
    )
    for cg, sweeps, rng in variants:
        s = LogitICARGibbs(
            Qh, Wh, Xh, yh, random_state=HEAD['seed'], cg_iters=cg,
            spatial_sweeps=sweeps, solver_check_tol=None,
        )
        s.rng_impl = rng
        s.scan_chunk = HEAD['size']
        try:
            t0 = time.time()
            s.sample(HEAD['size'], chains=HEAD['chains'],
                     progressbar=False)
            warm = time.time() - t0
            t0 = time.time()
            post = s.sample(HEAD['size'], burnin=HEAD['burnin'],
                            chains=HEAD['chains'], progressbar=False)
            wall = time.time() - t0
        except Exception as exc:
            print(f'cg={cg} sweeps={sweeps} rng={rng}: FAILED {exc!r}',
                  flush=True)
            continue
        ess = min_ess_per_param(post.data)
        row = {
            'cg_iters': cg, 'sweeps': s.spatial_sweeps, 'rng': rng,
            'warm_s': round(warm, 1),
            'iters_per_sec': round(HEAD['size'] / wall, 2),
            'min_pooled_ess': round(ess, 1),
            'ess_per_sec': round(ess / wall, 2),
            'run_resid_max': round(float(s.last_solver_resid), 6),
            'beta_mean': np.round(
                post['beta'].mean(axis=(0, 1)), 4
            ).tolist(),
        }
        print('ROW ' + json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
