"""occuspytial_tpu: TPU-native Bayesian spatial occupancy models in JAX.

A ground-up re-design of OccuSpytial (single-season site occupancy models
with ICAR/RSR spatial random effects) for TPU hardware: jit-compiled
lax.scan Gibbs kernels, vmapped parallel chains, vectorized Pólya-Gamma
augmentation, and Cholesky-based constrained Gaussian draws. Public
surface mirrors reference occuspytial/__init__.py:1-6 plus the rebuild
additions (ProbitICARGibbs, OccupancyData, diagnostics).
"""

from .data import Data, OccupancyData, pack_detection_data
from .models import (
    LogitICARGibbs,
    LogitRSRGibbs,
    ProbitICARGibbs,
    ProbitRSRGibbs,
)
from .posterior import PosteriorParameter
from .chain import Chain

__all__ = (
    'LogitICARGibbs',
    'LogitRSRGibbs',
    'ProbitICARGibbs',
    'ProbitRSRGibbs',
    'Data',
    'OccupancyData',
    'pack_detection_data',
    'PosteriorParameter',
    'Chain',
)

__version__ = '0.2.0'
