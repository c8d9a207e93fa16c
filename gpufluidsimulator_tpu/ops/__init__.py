from . import kernels, naive, physics  # noqa: F401
