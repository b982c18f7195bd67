"""Per-parameter pooled bulk-ESS breakdown on the headline config.

Identifies WHICH scalar binds the headline's min-ESS metric (bench.py's
judged number) for a given sampler variant — the input that decides
where the next kernel-tuning effort goes (spatial block vs detection
block vs tau move).

Usage: python scripts/ess_breakdown.py [spatial_sweeps [seed]]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax

    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.jax_cache'),
    )
    import numpy as np

    from bench import HEAD
    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu import diagnostics as dg
    from occuspytial_tpu.utils import make_data

    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else None
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else HEAD['seed']
    Q, W, X, y, *_ = make_data(
        n=HEAD['n'], ns=HEAD['ns'], p=HEAD['p'], q=HEAD['q'],
        min_v=HEAD['min_v'], max_v=HEAD['max_v'],
        random_state=HEAD['seed'],
    )
    kwargs = {} if sweeps is None else {'spatial_sweeps': sweeps}
    s = LogitICARGibbs(Q, W, X, y, random_state=seed, **kwargs)
    s.scan_chunk = HEAD['size']
    post = s.sample(
        HEAD['size'], burnin=HEAD['burnin'], chains=HEAD['chains'],
        progressbar=False,
    )
    for name in ('alpha', 'beta', 'tau'):
        arr = np.asarray(post[name])
        if arr.ndim == 2:
            print(f'{name}: ess {dg.ess_bulk(arr):.0f}')
        else:
            for j in range(arr.shape[2]):
                print(f'{name}[{j}]: ess {dg.ess_bulk(arr[:, :, j]):.0f}')


if __name__ == '__main__':
    main()
