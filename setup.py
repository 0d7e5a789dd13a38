"""Build the native host-side extension: python setup.py build_ext --inplace.

The device compute path is XLA/Pallas; this C++ module covers the CPU-bound
host pipeline (group-key discovery, chunk padding, bitmap unpack) — the
counterpart of the reference's vaex-core C++ modules (see src/vaex_native.cpp).
The package works without it (pure-python fallbacks in vaex_tpu/native.py).
"""

from setuptools import Extension, setup

setup(
    name="vaex_tpu",
    version="0.1.0",
    packages=["vaex_tpu"],
    ext_modules=[
        Extension(
            "vaex_tpu._native",
            sources=["src/vaex_native.cpp"],
            extra_compile_args=["-std=c++17", "-O3"],
            language="c++",
        )
    ],
)
