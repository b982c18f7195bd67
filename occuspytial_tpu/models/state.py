"""Attribute-style state containers (API parity with reference
gibbs/state.py).

The TPU samplers carry their hot-loop state as plain dict pytrees (they
must be jax-transformable), so these classes are *user-facing*
conveniences: ``State`` wraps a sampler state for attribute access and
``FixedState`` is the write-once variant the reference uses for
configuration containers (reference gibbs/state.py:16-27).
"""

from types import SimpleNamespace


class BaseStorage(SimpleNamespace):
    """Attribute namespace with dict-style item access."""

    def __getitem__(self, key):
        return self.__dict__[key]


class State(BaseStorage):
    """Store parameter variables so they can be accessed as attributes."""

    def __iter__(self):
        yield from self.__dict__

    def as_dict(self):
        """The underlying pytree-compatible dict."""
        return dict(self.__dict__)


class FixedState(BaseStorage):
    """Write-once storage: reassigning an attribute raises KeyError
    (reference gibbs/state.py:24-27)."""

    def __setattr__(self, name, value):
        if name in self.__dict__:
            raise KeyError('cannot change attributes already set')
        super().__setattr__(name, value)
