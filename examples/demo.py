"""The reference demo (`/root/reference/main.cpp:181-205`), TPU-native.

Prints the quaternion and position stacks for the hard-coded bending strain,
plus tip values to compare with the golden data in SURVEY.md §4.
Run: python examples/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import oracle


def main():
    qe_dd = rod.split_strain(oracle.demo_qe())
    sol = rod.rod_shape(qe_dd, method="refined")
    print("Q_stack (component-major, reference layout):")
    print(np.swapaxes(sol.quaternions_f64(), -1, -2).reshape(-1))
    print("r_stack:")
    print(sol.positions_f64())
    print("\ntip quaternion:", sol.quaternions_f64()[0])
    print("tip position:  ", sol.positions_f64()[0])
    print("expected:       (0.799770, 0, 0.600307, 0) / (0.562673, 0, -0.745914)")


if __name__ == "__main__":
    main()
