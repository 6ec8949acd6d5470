from . import problems, problems3d  # noqa: F401
from .problems3d import CATALOGUE3D, Problem3D  # noqa: F401
from .problems import (  # noqa: F401
    CATALOGUE,
    Problem,
    from_callables,
    helmholtz_mms,
    poisson_mms_sinsin,
    variable_coefficient_mms,
)
