"""Test harness config: CPU backend with 8 virtual devices + x64.

Tests run on the CPU backend (f64 available → oracle-grade comparisons, and
an 8-device virtual mesh to exercise the multi-chip sharding path without
hardware, per the driver's `dryrun_multichip` contract).  TPU-hardware
numerics gates run separately in `bench.py` / scripts on the real chip.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# The axon TPU plugin overrides JAX_PLATFORMS env; force CPU via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
