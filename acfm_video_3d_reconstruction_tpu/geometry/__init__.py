from . import camera, geodesic, icosphere, mesh_ops, quaternion, symmetry  # noqa: F401
