"""Re-measure every CPU floor into benchmarks/floor_cache.json.

Run after any change to the benchmark metric or the floor samplers: the
cache keys are metric-tagged (bench.METRIC_TAG), so stale entries are
recomputed and overwritten. Forces the CPU jax backend — floors must
never touch the TPU.
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402
from bench import (  # noqa: E402
    HEAD,
    log,
    make_lattice_dataset,
    measure_floor_config,
    measure_floor_headline,
)


def main():
    from benchmarks.reference_floor import (
        NumpyLogitICAR,
        NumpyLogitRSR,
        NumpyProbitICAR,
        NumpyProbitRSR,
    )
    from occuspytial_tpu.utils import make_data

    Qh, Wh, Xh, yh, *_ = make_data(
        n=HEAD['n'], ns=HEAD['ns'], p=HEAD['p'], q=HEAD['q'],
        min_v=HEAD['min_v'], max_v=HEAD['max_v'],
        random_state=HEAD['seed'],
    )
    measure_floor_headline((Qh, Wh, Xh, yh))

    Q1, W1, X1, y1, *_ = make_lattice_dataset(10, 10, ns=50, seed=3)
    measure_floor_config(
        'floor1_logit_icar_100site',
        lambda: NumpyLogitICAR(Q1, W1, X1, y1, random_state=3),
        chains=4, size=2048, burnin=512,
    )
    measure_floor_config(
        'floor2_probit_icar_100site',
        lambda: NumpyProbitICAR(Q1, W1, X1, y1, random_state=3),
        chains=4, size=2048, burnin=512,
    )
    measure_floor_config(
        'floor2_probit_rsr_100site',
        lambda: NumpyProbitRSR(Q1, W1, X1, y1, random_state=3),
        chains=4, size=2048, burnin=512,
    )
    measure_floor_config(
        'floor3_logit_rsr_1000site',
        lambda: NumpyLogitRSR(
            Qh, Wh, Xh, yh, random_state=HEAD['seed'], q=100
        ),
        chains=4, size=1500, burnin=500,
    )

    Q5, W5, X5, y5, *_ = make_lattice_dataset(
        100, 100, ns=5000, seed=11, min_v=2, max_v=5,
    )
    measure_floor_config(
        'floor5_logit_icar_10000site',
        lambda: NumpyLogitICAR(Q5, W5, X5, y5, random_state=11),
        chains=2, size=400, burnin=100,
    )
    log('floor cache refreshed: ' + bench.CACHE)


if __name__ == '__main__':
    main()
