from .mesh import make_mesh, batch_sharding, param_sharding  # noqa: F401
from . import dist  # noqa: F401
