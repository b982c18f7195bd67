"""Optional native (C++) host-side kernels.

``_packer`` accelerates the one-time ragged->padded survey-data packing
(see native/packer.cpp). Import failure is fine — callers fall back to
pure numpy.
"""

try:
    from . import _packer  # noqa: F401

    HAVE_PACKER = True
except ImportError:  # extension not built
    _packer = None
    HAVE_PACKER = False
