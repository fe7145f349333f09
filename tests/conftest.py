"""Test harness config: CPU backend with 8 virtual devices + x64.

Tests run on the CPU backend (f64 available → oracle-grade comparisons, and
an 8-device virtual mesh to exercise the multi-chip sharding path without
hardware, per the driver's `dryrun_multichip` contract).  TPU-hardware
numerics gates run separately in `bench.py` / scripts on the real chip.
"""

import gc
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import pytest

# The axon TPU plugin overrides JAX_PLATFORMS env; force CPU via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_state():
    """Drop compiled executables between test modules.

    A full-suite run accumulates hundreds of jitted programs in one
    process; past ~80% this has (twice) segfaulted inside XLA:CPU's
    ``backend_compile_and_load`` — an upstream compiler flake under large
    in-process JIT state, not reproducible on the same tests in a fresh
    process.  Clearing per module bounds that state; cross-module
    compilation reuse is small (modules parameterize different shapes), so
    the runtime cost is minor.
    """
    yield
    jax.clear_caches()
    gc.collect()
