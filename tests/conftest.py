"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host platform
to expose 8 XLA CPU devices (SURVEY.md §4: test strategy for distributed BA).
Environment variables must be set before jax initializes, hence this module-level
code in conftest.
"""

import os
import resource

# XLA's CPU backend compiles our large while_loop programs on worker threads
# whose stacks inherit RLIMIT_STACK (8 MB default) at thread creation; deep
# LLVM recursion has segfaulted mid-suite (nondeterministic location, always
# inside backend_compile).  Raise the limit BEFORE jax starts any thread.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The session env pins JAX_PLATFORMS=axon (remote TPU tunnel); the env var is ignored
# by this build, so force the CPU platform through the config API.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: reruns of the suite skip the expensive
# compiles entirely (the first cold run still compiles everything).
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_compiler_memory():
    """Free compiled executables between test modules: the CPU compiler's
    in-process memory grows over the ~180-test suite and has ended in
    segfaults inside backend_compile; modules rarely share shapes anyway."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
