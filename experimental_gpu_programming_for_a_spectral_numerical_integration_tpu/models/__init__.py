from . import rod  # noqa: F401
