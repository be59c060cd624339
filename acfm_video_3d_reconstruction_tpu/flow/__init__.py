from . import maskflownet, ops  # noqa: F401
