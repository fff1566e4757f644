from . import ops, resample  # noqa: F401
