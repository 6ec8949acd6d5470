from . import multigrid  # noqa: F401
from .multigrid import (  # noqa: F401
    Level,
    MultigridConfig,
    build_hierarchy,
    convergence_factor,
    fmg,
    mg_cycle,
    mg_solve,
)
from . import refinement  # noqa: F401
from .refinement import adaptive_solve, ir_solve  # noqa: F401
