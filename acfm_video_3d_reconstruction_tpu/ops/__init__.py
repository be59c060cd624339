from . import grid_sample, rasterizer  # noqa: F401
