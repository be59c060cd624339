from .losses import *  # noqa: F401,F403
from . import losses  # noqa: F401
