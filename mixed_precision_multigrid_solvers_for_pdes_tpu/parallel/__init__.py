from . import distributed, halo_solve, mesh  # noqa: F401
from .halo_solve import global_residual_norm, shard_smooth  # noqa: F401
from .distributed import make_constrainer, shard_inputs, sharded_solve  # noqa: F401
from .mesh import (  # noqa: F401
    choose_mesh_shape,
    graded_sharding,
    grid_sharding,
    make_graded_mesh,
    make_mesh,
    replicated,
)
