from . import encoder, heads, mesh_net, nn_blocks, template, texture  # noqa: F401
from .mesh_net import MeshNet  # noqa: F401
from .template import Template, build_template  # noqa: F401
