from . import problems  # noqa: F401
from .problems import (  # noqa: F401
    CATALOGUE,
    Problem,
    from_callables,
    helmholtz_mms,
    poisson_mms_sinsin,
    variable_coefficient_mms,
)
