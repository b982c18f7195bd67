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
