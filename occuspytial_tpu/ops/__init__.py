"""Numeric kernels: distributions, spatial ops, solvers."""

from . import icar, mvnorm, polyagamma, truncnorm

__all__ = ('icar', 'mvnorm', 'polyagamma', 'truncnorm')
