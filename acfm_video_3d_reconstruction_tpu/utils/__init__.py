from . import obj_io  # noqa: F401
