from . import chebyshev, basis, lie, collocation, doubledouble  # noqa: F401
