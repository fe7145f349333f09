"""TPU-native spectral numerical integration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``aGotelli/experimental_gpu_programming_for_a_spectral_numerical_integration``
(reference mounted at ``/root/reference``): Chebyshev–Gauss–Lobatto spectral
collocation for linear matrix ODE IVPs/BVPs, with the Cosserat-rod
quaternion/position kinematics as the flagship workload — jittable,
vmappable over large rod batches, shardable over TPU meshes, and accurate to
f64-class error bars on f32-only TPU hardware via double-word arithmetic.

Suggested import alias::

    import experimental_gpu_programming_for_a_spectral_numerical_integration_tpu as spectral_tpu
"""

from .ops import chebyshev, basis, lie, collocation, doubledouble
from .ops.chebyshev import cgl_points, diff_matrix, clenshaw_curtis_weights
from .ops.collocation import (
    SpectralGrid,
    make_grid,
    solve_ivp_dense,
    solve_ivp_picard,
    solve_ivp_refined,
)
from .models.rod import (
    RodConfig,
    RodSolution,
    rod_shape,
    rod_shape_refined_fused,
    quaternion_kinematics,
    split_strain,
    demo_qe,
)
from .models import (ivp, cosserat, segments, calibration, dynamics,
                     bifurcation, segment_statics, tendon, constrained,
                     magnetics, sensing, ctr, estimation, control)

__version__ = "0.1.0"

__all__ = [
    "chebyshev",
    "basis",
    "lie",
    "collocation",
    "doubledouble",
    "cgl_points",
    "diff_matrix",
    "clenshaw_curtis_weights",
    "SpectralGrid",
    "make_grid",
    "solve_ivp_dense",
    "solve_ivp_picard",
    "solve_ivp_refined",
    "RodConfig",
    "RodSolution",
    "rod_shape",
    "rod_shape_refined_fused",
    "quaternion_kinematics",
    "split_strain",
    "demo_qe",
    "ivp",
    "cosserat",
    "segments",
    "calibration",
    "dynamics",
    "bifurcation",
    "segment_statics",
    "tendon",
    "constrained",
    "magnetics",
    "sensing",
    "ctr",
    "estimation",
    "control",
]
