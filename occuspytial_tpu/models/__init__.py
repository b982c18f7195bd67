"""Gibbs sampler model families (logit/probit x ICAR/RSR)."""

from .base import GibbsBase
from .logit import LogitICARGibbs, LogitRSRGibbs
from .probit import ProbitICARGibbs, ProbitRSRGibbs

__all__ = (
    'GibbsBase',
    'LogitICARGibbs',
    'LogitRSRGibbs',
    'ProbitICARGibbs',
    'ProbitRSRGibbs',
)
