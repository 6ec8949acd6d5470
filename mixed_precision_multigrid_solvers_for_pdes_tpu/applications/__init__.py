"""Problem frontends: Poisson and heat-equation solvers.

Counterpart of the reference's applications layer
(reference src/multigrid/applications/), redesigned so every implicit step /
solve is a single jitted XLA computation.
"""

from .heat import (  # noqa: F401
    HeatConfig,
    HeatProblem,
    HeatResult,
    heat_problem_from_callables,
    solve_heat,
    stability_limit_dt,
)
from . import heat3d, heat_problems, precision_analysis  # noqa: F401
from .precision_analysis import MixedPrecisionAnalyzer  # noqa: F401
from .heat3d import HeatProblem3D, solve_heat3d  # noqa: F401
from .poisson import (  # noqa: F401
    PoissonResult,
    convergence_study,
    solve_poisson,
)
from .poisson3d import (  # noqa: F401
    convergence_study3d,
    solve_poisson3d,
)
