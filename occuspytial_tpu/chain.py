"""Preallocated per-parameter sample storage (host side).

API-parity port of reference chain.py:4-117. In the TPU rebuild the hot
path returns whole stacked arrays from a compiled scan, so ``Chain`` is a
host-side convenience for incremental workflows (streaming draws out of
chunked runs, resuming, growing storage) rather than the per-iteration
store it is in the reference (reference gibbs/base.py:227-239).
"""

import numpy as np


class Chain:
    """Container to store parameter chains during sampling.

    Parameters
    ----------
    params : Dict[str, int]
        Parameter name -> dimensionality (1 for scalars).
    size : int
        Capacity of the chain.
    """

    def __init__(self, params, size):
        self.size = size
        self._names = tuple(params)
        self._store = {}
        self._index = 0
        for key, cols in params.items():
            self._store[key] = (
                np.zeros((size, cols)) if cols > 1 else np.zeros(size)
            )

    @property
    def full(self):
        """Concatenation of all parameter chains, trimmed to filled rows."""
        out = []
        for val in self._store.values():
            out.append(val if val.ndim > 1 else val[:, None])
        return np.concatenate(out, axis=1)[: self._index]

    def append(self, params):
        """Append one draw per parameter; raises when capacity is reached."""
        if self._index > (self.size - 1):
            raise ValueError('Chain is full, cannot append any new values')
        for key, value in params.items():
            self._store[key][self._index] = value
        self._index += 1

    def extend(self, params):
        """Append a block of draws per parameter (vectorized append).

        ``params`` maps name -> (m[, dim]) array. TPU-rebuild addition: the
        chunked scan driver emits draws in blocks, not one at a time.
        """
        # validate every block before writing anything: a mid-write error
        # must not leave the store partially updated or out of sync with
        # the fill index
        blocks = {k: np.asarray(v) for k, v in params.items()}
        lengths = {v.shape[0] for v in blocks.values()}
        if len(lengths) > 1:
            raise ValueError(
                f'all parameter blocks must share one leading length, '
                f'got {sorted(lengths)}'
            )
        m = lengths.pop() if lengths else 0
        if self._index + m > self.size:
            raise ValueError('Chain is full, cannot append any new values')
        for key, value in blocks.items():
            self._store[key][self._index:self._index + m] = value
        self._index += m

    def expand(self, size):
        """Grow capacity by ``size`` rows (reference chain.py:76-92)."""
        for key, value in self._store.items():
            if value.ndim > 1:
                new = np.zeros((size, value.shape[1]))
                self._store[key] = np.append(value, new, axis=0)
            else:
                self._store[key] = np.append(value, np.zeros(size))
        self.size += size

    def __getitem__(self, name):
        return self._store[name][: self._index]

    def __len__(self):
        return self._index

    def __repr__(self):
        return f'Chain(params: {self._names}, size: {self._index})'
