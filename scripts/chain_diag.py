"""Per-chain diagnostic for a headline-config variant:seed run.

Reruns the exact headline protocol for one sampler variant and prints a
per-chain table (posterior mean of beta[0], tau, per-chain bulk ESS of
the min-ESS parameter) plus the pooled numbers — built to dissect
stuck-chain events like cg10:seed9 in the 2026-08-20 tune sweep, where
ONE bad chain collapsed the pooled min-ESS from ~14k to 793.

Usage: python scripts/chain_diag.py [variant [seed]]   (default base 7)
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
    from scripts.headline_tune import VARIANTS

    variant = sys.argv[1] if len(sys.argv) > 1 else 'base'
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else HEAD['seed']
    Q, W, X, y, *_ = make_data(
        n=HEAD['n'], ns=HEAD['ns'], p=HEAD['p'], q=HEAD['q'],
        min_v=HEAD['min_v'], max_v=HEAD['max_v'],
        random_state=HEAD['seed'],
    )
    opts = dict(VARIANTS[variant])
    opts.pop('rng_impl', None)
    s = LogitICARGibbs(Q, W, X, y, random_state=seed, **opts)
    s.scan_chunk = HEAD['size']
    post = s.sample(
        HEAD['size'], burnin=HEAD['burnin'], chains=HEAD['chains'],
        progressbar=False,
    )

    names = []
    cols = []
    for name in ('alpha', 'beta', 'tau'):
        arr = np.asarray(post[name])
        if arr.ndim == 2:
            names.append(name)
            cols.append(arr[:, :, None])
        else:
            names += [f'{name}[{j}]' for j in range(arr.shape[2])]
            cols.append(arr)
    flat = np.concatenate(cols, axis=2)  # (chains, draws, k)

    pooled = [dg.ess_bulk(flat[:, :, j]) for j in range(flat.shape[2])]
    worst = int(np.nanargmin(pooled))
    print(f'pooled ESS: ' + ' '.join(
        f'{n}={e:.0f}' for n, e in zip(names, pooled)
    ))
    print(f'binding parameter: {names[worst]}')

    # per-chain stats on the binding parameter + tau + beta[0]
    b0 = names.index('beta[0]')
    t_i = names.index('tau')
    print(f'{"chain":>5} {"ess(worst)":>10} {names[worst]+" mean":>12} '
          f'{"beta0 mean":>10} {"tau mean":>9} {"tau min":>9} '
          f'{"tau max":>9}')
    rows = []
    for c in range(flat.shape[0]):
        ess_c = dg.ess_bulk(flat[c : c + 1, :, worst])
        rows.append((
            c, ess_c, flat[c, :, worst].mean(), flat[c, :, b0].mean(),
            flat[c, :, t_i].mean(), flat[c, :, t_i].min(),
            flat[c, :, t_i].max(),
        ))
    rows.sort(key=lambda r: r[1])
    for r in rows[:8]:
        print(f'{r[0]:>5} {r[1]:>10.0f} {r[2]:>12.4f} {r[3]:>10.4f} '
              f'{r[4]:>9.3f} {r[5]:>9.4f} {r[6]:>9.3f}')
    print('...')
    for r in rows[-3:]:
        print(f'{r[0]:>5} {r[1]:>10.0f} {r[2]:>12.4f} {r[3]:>10.4f} '
              f'{r[4]:>9.3f} {r[5]:>9.4f} {r[6]:>9.3f}')


if __name__ == '__main__':
    main()
