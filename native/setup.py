"""Build the native data-loader extension:

    python native/setup.py build_ext --inplace

Produces dpt_native.*.so importable from the repo root. The Python pipeline
(diffusion_pruning_tpu/data/loader.py) picks it up automatically and falls
back to PIL when absent.
"""
import numpy as np
from setuptools import Extension, setup

setup(
    name="dpt_native",
    ext_modules=[
        Extension(
            "dpt_native",
            sources=["native/decoder.cpp"],
            include_dirs=[np.get_include()],
            libraries=["jpeg"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
        )
    ],
)
