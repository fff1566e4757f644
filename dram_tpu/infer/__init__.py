from .engine import LesionSegTest  # noqa: F401
