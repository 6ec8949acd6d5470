"""Validation: MMS convergence studies, theoretical factors, baselines.

Counterpart of reference src/multigrid/validation/ — all paths here run REAL
solves (the reference's sibling ``benchmarks/`` package synthesized its
results from np.random; see SURVEY.md section 0 — this build has no simulated
path anywhere).
"""

from .mms import MMSValidator  # noqa: F401
from .theory import TheoreticalAnalyzer, measure_two_grid_factor  # noqa: F401
from .baselines import PerformanceBaselines  # noqa: F401
