from . import distributed, mesh  # noqa: F401
from .distributed import make_constrainer, shard_inputs, sharded_solve  # noqa: F401
from .mesh import choose_mesh_shape, grid_sharding, make_mesh, replicated  # noqa: F401
