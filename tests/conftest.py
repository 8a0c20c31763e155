"""Test configuration: force an 8-device virtual CPU platform.

The reference repo has no test suite (SURVEY.md §4); multi-device behaviour
there was only exercised on real clusters. Here every collective code path is
tested on a virtual 8-device CPU mesh, JAX's standard fake-backend mechanism.

Uses jax.config.update (not env vars) so it works even if a pytest plugin
imported jax before this conftest ran — config is mutable until the backend
is first initialised.
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NO persistent compilation cache for CPU tests: under the axon remote-
# compile environment, XLA:CPU executables are AOT-compiled on a DIFFERENT
# host CPU; re-loading them from a cache aborts with SIGILL (machine-feature
# mismatch — reproduced: cold suite passes, warm suite aborts in the
# multi-device tests). Cold compiles cost a few extra minutes but are safe.

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
