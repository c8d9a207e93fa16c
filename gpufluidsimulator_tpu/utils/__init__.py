from . import checkpoint, metrics, profiling  # noqa: F401
