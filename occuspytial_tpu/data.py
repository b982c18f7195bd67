"""Static-shape occupancy survey data for TPU samplers.

The reference stores detection data as a Cython dict-of-ragged-arrays
container whose ``__getitem__`` concatenates per-site arrays on the fly
(reference data.pyx:34-147). TPU/XLA needs static shapes, so this module
re-designs the container as padded dense tensors plus boolean masks:

    W          (n, v_max, n_alpha)  detection design matrices, zero-padded
    y          (n, v_max)           detection outcomes, zero-padded
    visit_mask (n, v_max)           True for real (site, visit) cells
    surveyed   (n,)                 True where the site was surveyed
    obs        (n,)                 True where the species was ever detected

All dynamic site bookkeeping of the reference (``surveyed`` /
``not_surveyed`` / ``obs`` / ``not_obs`` Python lists, the ``reduceat``
index table; reference gibbs/base.py:113-152) collapses into these masks,
and every ragged gather in the hot loop becomes a masked dense reduction.
"""

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OccupancyData:
    """Padded, masked survey data (a pytree of device-ready arrays)."""

    W: jax.Array          # (n, v_max, n_alpha)
    y: jax.Array          # (n, v_max)
    visit_mask: jax.Array  # (n, v_max) bool
    surveyed: jax.Array    # (n,) bool
    obs: jax.Array         # (n,) bool

    @property
    def n_sites(self):
        return self.W.shape[0]

    @property
    def max_visits(self):
        return self.W.shape[1]

    @property
    def n_alpha(self):
        return self.W.shape[2]

    def visits(self):
        """Number of visits per site (0 for unsurveyed sites)."""
        return np.asarray(self.visit_mask).sum(axis=1)


def pack_detection_data(W, y, n_sites, dtype=np.float32):
    """Pack dict-of-ragged-arrays survey data into an OccupancyData.

    Parameters mirror the reference constructor (reference
    gibbs/base.py:84-88): ``W`` maps site index -> (visits_i, n_alpha)
    design matrix; ``y`` maps site index -> (visits_i,) detection
    indicators. Sites absent from the dicts are unsurveyed.
    """
    if set(W) != set(y):
        raise ValueError('W and y must contain the same site keys')
    sites = sorted(W)
    if sites and (min(sites) < 0 or max(sites) >= n_sites):
        raise ValueError('site keys must lie in [0, n_sites)')

    v_max = max((np.atleast_2d(W[s]).shape[0] for s in sites), default=1)
    n_alpha = np.atleast_2d(W[sites[0]]).shape[1] if sites else 1

    w_pad = np.zeros((n_sites, v_max, n_alpha), dtype=dtype)
    y_pad = np.zeros((n_sites, v_max), dtype=dtype)
    mask = np.zeros((n_sites, v_max), dtype=bool)
    surveyed = np.zeros(n_sites, dtype=bool)

    for s in sites:
        wi = np.atleast_2d(np.asarray(W[s], dtype=dtype))
        yi = np.atleast_1d(np.asarray(y[s], dtype=dtype))
        if wi.shape[0] != yi.shape[0]:
            raise ValueError(
                f'site {s}: W has {wi.shape[0]} visits but y has '
                f'{yi.shape[0]}'
            )
        if wi.shape[1] != n_alpha:
            raise ValueError(
                f'site {s}: expected {n_alpha} detection covariates, got '
                f'{wi.shape[1]}'
            )
        v = wi.shape[0]
        w_pad[s, :v] = wi
        y_pad[s, :v] = yi
        mask[s, :v] = True
        surveyed[s] = True

    obs = (y_pad * mask).sum(axis=1) > 0
    return OccupancyData(
        W=w_pad, y=y_pad, visit_mask=mask, surveyed=surveyed, obs=obs,
    )


def as_occupancy_data(W, y, n_sites, dtype=np.float32):
    """Coerce (dicts | OccupancyData) into an OccupancyData."""
    if isinstance(W, OccupancyData):
        return W
    return pack_detection_data(W, y, n_sites, dtype=dtype)
