"""Diagnostics + profiling utilities."""

import numpy as np
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
    diagnostics,
    oracle,
    profiling,
)


def test_condition_number_matches_survey():
    cond = diagnostics.condition_number(oracle.demo_qe())
    assert cond == pytest.approx(186, rel=0.2)


def test_quaternion_norm_drift_small():
    sol = rod.rod_shape(jnp.asarray(oracle.demo_qe()), method="dense")
    assert diagnostics.quaternion_norm_drift(sol) < 1e-11


def test_solution_residual_norm():
    sol = rod.rod_shape(jnp.asarray(oracle.demo_qe()), method="dense")
    assert diagnostics.solution_residual_norm(oracle.demo_qe(), sol) < 1e-11


def test_convergence_report_decays():
    rep = diagnostics.convergence_report(jnp.asarray(oracle.demo_qe()),
                                         ns=(8, 12, 16))
    assert rep[16] < rep[12] < rep[8]
    assert rep[16] < 1e-9


def test_throughput_rejects_nonscalar():
    import jax

    f = jax.jit(lambda x: x * 2)
    with pytest.raises(ValueError, match="scalar"):
        profiling.throughput(f, jnp.ones(4))


def test_throughput_scalar_ok():
    import jax

    f = jax.jit(lambda x: jnp.sum(x * 2))
    dt, rate = profiling.throughput(f, jnp.ones(1024), reps=3, items=1024)
    assert dt > 0
    assert rate > 0


def test_timer_laps():
    t = profiling.Timer()
    t.lap("a")
    t.lap("b")
    rep = t.report()
    assert set(rep) == {"a", "b"}
    assert all(v >= 0 for v in rep.values())


def test_picard_iteration_planner():
    # demo-field curvature |K| ~ 3 -> rho ~ 1.5: a handful of iterations
    k_demo = diagnostics.picard_iterations_needed(1.5, tol=1e-7)
    assert 5 <= k_demo <= 15
    # the default 20-24 iterations cover rho up to ~4 at f32 tolerance
    assert diagnostics.picard_error_bound(4.0, 24) < 1e-7
    # planner's answer really achieves the tolerance numerically
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import ivp
    import numpy as np

    k = (0.0, 3.0, 0.0)  # rho = |k| L / 2 = 1.5
    num, exact = ivp.rotating_frame_ivp(k=k, n=16, method="picard")
    assert float(np.max(np.abs(np.asarray(num) - np.asarray(exact)))) < 1e-9


def test_picard_planner_rejects_huge_rho():
    with pytest.raises(ValueError, match="segments"):
        diagnostics.picard_iterations_needed(500.0, tol=1e-7, max_iters=50)


def test_solves_clean_under_debug_nans():
    """SURVEY §5 sanitizer row: the solve paths must not trip
    jax_debug_nans (no hidden 0/0 or inf intermediates)."""
    import jax

    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
        oracle as _oracle,
    )

    jax.config.update("jax_debug_nans", True)
    try:
        qe = jnp.asarray(np.asarray(_oracle.demo_qe()), jnp.float32)
        rod.rod_shape(qe, method="picard")
        rod.rod_shape(rod.split_strain(np.asarray(_oracle.demo_qe())),
                      method="refined")
    finally:
        jax.config.update("jax_debug_nans", False)
