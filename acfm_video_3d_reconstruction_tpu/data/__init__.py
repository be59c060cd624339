from . import image_utils, synthetic  # noqa: F401
