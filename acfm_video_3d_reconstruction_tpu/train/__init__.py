from . import monocular  # noqa: F401
