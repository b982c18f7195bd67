from . import icar, mvnorm, polyagamma, truncnorm

__all__ = ('icar', 'mvnorm', 'polyagamma', 'truncnorm')
