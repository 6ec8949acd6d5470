from . import bc, grid, grid3d, precision  # noqa: F401
from .grid3d import Grid3D  # noqa: F401
from .grid import Grid  # noqa: F401
from .bc import BCKind, BCSide, BoundarySpec, dirichlet, neumann, mixed  # noqa: F401
from .precision import Precision, PrecisionPolicy, policy  # noqa: F401
