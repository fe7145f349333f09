"""bench.py and __graft_entry__ are driver-critical: smoke-test them on the
CPU backend with tiny shapes so a regression is caught before the driver runs
them on hardware."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_valid_json_line():
    # (bounded by the subprocess timeout below; the pytest-timeout plugin
    # is not installed, so a mark would silently not apply)
    env = dict(os.environ)
    env.update({
        "BENCH_BATCH": "2048",
        "BENCH_REPS": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_PLATFORMS": "cpu",
    })
    # the axon plugin overrides JAX_PLATFORMS; force via jax config shim
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy; runpy.run_path('bench.py', run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=580,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    payload = json.loads(lines[0])
    assert set(payload) >= {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    assert payload["extra"]["accuracy_gate_1e-8"] is True
