from . import distributed, halo, mesh  # noqa: F401
from .halo import global_residual_norm, shard_smooth  # noqa: F401
from .distributed import make_constrainer, shard_inputs, sharded_solve  # noqa: F401
from .mesh import choose_mesh_shape, grid_sharding, make_mesh, replicated  # noqa: F401
