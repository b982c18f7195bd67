"""Generate and execute docs/user_guide.ipynb.

Notebook analog of the reference's docs/user_guide.ipynb (input format,
sampling, hyperpriors, posterior analysis) with *stored outputs* — the
reference ships its notebook unexecuted. Re-run this script after API
changes; it executes the notebook on the CPU backend so the stored
outputs are reproducible anywhere.
"""

import os

import nbformat as nbf
from nbclient import NotebookClient

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, 'docs', 'user_guide.ipynb')

md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

CELLS = [
    md(
        '# occuspytial-tpu user guide\n\n'
        'Bayesian single-season spatial occupancy modelling on TPU '
        '(or any JAX backend). This notebook walks the full workflow: '
        'simulating a dataset, the input format, sampling, hyperprior '
        'overrides, and posterior analysis.\n\n'
        'The model: occupancy `z_i ~ Bernoulli(psi_i)` with '
        '`psi = f(X beta + eta)`, detection `y_ij ~ Bernoulli(z_i '
        'd_ij)` with `d = f(W alpha)`, and an ICAR prior on the '
        'spatial field `eta`.'
    ),
    code(
        'import jax\n'
        "# the notebook runs everywhere; on a TPU VM drop this line\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        'import numpy as np'
    ),
    md(
        '## Simulate a dataset\n\n'
        '`make_data` mirrors the upstream simulator: a random lattice '
        'ICAR precision `Q`, design matrices, and ragged per-site '
        'detection histories. `W` and `y` are dicts keyed by '
        'surveyed-site index — the exact input format the samplers '
        'accept.'
    ),
    code(
        'from occuspytial_tpu.utils import make_data\n\n'
        'Q, W, X, y, alpha, beta, tau, z = make_data(\n'
        '    n=300, ns=200, p=3, q=2, random_state=11,\n'
        ')\n'
        'print(f"Q {Q.shape} (sparse), X {X.shape}, "\n'
        '      f"{len(W)} surveyed sites")\n'
        'site = next(iter(W))\n'
        'print(f"site {site}: visits {W[site].shape[0]}, "\n'
        '      f"detections {y[site]}")'
    ),
    md(
        '## Sampling\n\n'
        'Construct a sampler with `(Q, W, X, y)` and draw. The first '
        'call compiles one XLA program for the whole chain sweep; '
        'subsequent calls (any `size`, any instance of the same model '
        'shape) reuse it.'
    ),
    code(
        'from occuspytial_tpu import LogitRSRGibbs\n\n'
        'sampler = LogitRSRGibbs(Q, W, X, y, random_state=11)\n'
        'post = sampler.sample(\n'
        '    1000, burnin=500, chains=4, progressbar=False,\n'
        ')\n'
        'post.summary'
    ),
    md(
        'True values for comparison (the detection/occupancy effects '
        'should be recovered within posterior uncertainty):'
    ),
    code("print('alpha:', alpha)\nprint('beta: ', beta)"),
    md(
        '## Hyperpriors\n\n'
        'The six hyperparameters follow the upstream contract: '
        '`a_mu`/`a_prec` (detection), `b_mu`/`b_prec` (occupancy), '
        '`tau_shape`/`tau_rate` (ICAR precision).'
    ),
    code(
        'hp = {\n'
        "    'a_mu': np.zeros(2), 'a_prec': np.eye(2) / 100,\n"
        "    'b_mu': np.zeros(3), 'b_prec': np.eye(3) / 100,\n"
        "    'tau_shape': 1.0, 'tau_rate': 0.01,\n"
        '}\n'
        'wide = LogitRSRGibbs(Q, W, X, y, hparams=hp, random_state=11)\n'
        'wide.sample(400, burnin=200, chains=2,\n'
        '            progressbar=False).summary.head(3)'
    ),
    md(
        '## Posterior analysis\n\n'
        '`PosteriorParameter` indexes raw `(chains, draws[, dim])` '
        'arrays and renders the standard plots; '
        '`to_inference_data()` bridges into arviz when installed.'
    ),
    code(
        "print(post['beta'].shape)\n"
        "print('pooled beta mean:', "
        "np.asarray(post['beta']).mean(axis=(0, 1)))"
    ),
    code(
        "import matplotlib\nmatplotlib.use('Agg')\n"
        'axes = post.plot_trace()\n'
        'axes.shape'
    ),
    md(
        '## Checkpoint / resume and multi-device scaling\n\n'
        '- `sampler.final_carry` (or `save_carry`/`load_carry`) resumes '
        'a run bitwise-exactly.\n'
        '- `occuspytial_tpu.parallel.sample_parallel` shards chains '
        'over a device mesh; `sample_parallel_2d` additionally shards '
        'the *site* axis for large lattices.\n'
        '- `LogitICARGibbs(..., lattice=(rows, cols))` switches to the '
        'O(n) matrix-free solver for big grids.'
    ),
    code(
        "sampler.save_carry('/tmp/carry.npz', sampler.final_carry)\n"
        'resumed = sampler.sample(\n'
        '    200, chains=4, progressbar=False,\n'
        "    resume_from=sampler.load_carry('/tmp/carry.npz'),\n"
        ')\n'
        "print('resumed draws:', resumed['beta'].shape)"
    ),
    md(
        '## Irregular spatial graphs (county maps, meshes)\n\n'
        'Real survey regions are rarely lattices. Pass any sparse ICAR '
        'precision and the ICAR samplers use the matrix-free graph '
        'solver (`solver="graph"`, automatic for sparse Q at large n): '
        'padded neighbor panels, a deflated-Jacobi CG, and — when the '
        'reordered bandwidth permits — a gather-free block-tridiagonal '
        'MXU layout. The probit ICAR sampler accepts the same solvers, '
        'and the RSR samplers compute their Moran basis matrix-free '
        'for sparse Q at 2048+ sites, so every family scales to 10k+ '
        'sites.'
    ),
    code(
        'import scipy.sparse as sps\n'
        'from scipy.spatial import Delaunay\n'
        'from occuspytial_tpu import LogitICARGibbs\n\n'
        'pts = np.random.default_rng(0).uniform(0, 1, (300, 2))\n'
        'tri = Delaunay(pts)\n'
        'r_, c_ = [], []\n'
        'for s3 in tri.simplices:\n'
        '    for a in range(3):\n'
        '        r_ += [s3[a], s3[(a + 1) % 3]]\n'
        '        c_ += [s3[(a + 1) % 3], s3[a]]\n'
        'adj = (sps.coo_matrix(\n'
        '    (np.ones(len(r_)), (r_, c_)), shape=(300, 300)\n'
        ') > 0).astype(float)\n'
        'q_graph = sps.csr_matrix(\n'
        '    sps.diags(np.asarray(adj.sum(1)).ravel()) - adj\n'
        ')\n'
        'gs = LogitICARGibbs(q_graph, W, X, y, random_state=11,\n'
        "                    solver='graph')\n"
        "print('solver:', gs.solver, '| banded tile:', gs.graph.block)\n"
        'gs.sample(200, burnin=100, chains=2,\n'
        '          progressbar=False).summary.head(3)'
    ),
]


def main():
    nb = nbf.v4.new_notebook(cells=CELLS)
    nb.metadata['kernelspec'] = {
        'name': 'python3', 'display_name': 'Python 3',
        'language': 'python',
    }
    client = NotebookClient(nb, timeout=1200, kernel_name='python3')
    client.execute()
    nbf.write(nb, OUT)
    n_out = sum(bool(c.get('outputs')) for c in nb.cells
                if c.cell_type == 'code')
    print(f'wrote {OUT} ({n_out} code cells with stored outputs)')


if __name__ == '__main__':
    main()
