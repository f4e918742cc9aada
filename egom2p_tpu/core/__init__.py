from .mesh import MeshConfig, make_mesh, local_mesh
from .precision import Precision, DEFAULT_PRECISION
