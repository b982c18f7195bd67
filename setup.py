"""Build script for the optional native extension.

Builds ``occuspytial_tpu.native._packer`` (C++, CPython + numpy C API) —
the host-side ragged->padded survey-data packer. The package works
without it (pure-numpy fallback in occuspytial_tpu/data.py); build with

    python setup.py build_ext --inplace
"""

import numpy
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            'occuspytial_tpu.native._packer',
            sources=['native/packer.cpp'],
            include_dirs=[numpy.get_include()],
            extra_compile_args=['-O3', '-std=c++17'],
        ),
    ],
)
