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
# Persistent compilation cache: repeated test runs skip XLA recompiles
# (essential on low-core CI hosts where CPU compiles dominate runtime).
# separate cache from the TPU one: XLA:CPU AOT entries are machine-feature
# sensitive (mismatched features SIGILL on load)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
