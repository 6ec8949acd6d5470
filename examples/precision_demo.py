#!/usr/bin/env python
"""Mixed-precision trade-off demo: fp64 vs fp32 vs mixed vs adaptive."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (  # noqa: E402
    MixedPrecisionAnalyzer,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.visualization import (  # noqa: E402
    AnalysisVisualizer,
)


def main():
    out = Path("demo_out")
    out.mkdir(exist_ok=True)
    an = MixedPrecisionAnalyzer(MultigridConfig(smoother="rbgs", omega=1.0,
                                                tol=1e-8))
    an.analyze(P.poisson_mms_sinsin(257), runs=3)
    report = an.report()
    print(json.dumps(report["tradeoffs"], indent=2, default=float))

    viz = AnalysisVisualizer()
    recs = [dict(r, n=257) for r in report["records"]]
    viz.plot_precision_tradeoff(recs, save=out / "precision_tradeoff.png")
    print(f"figures in {out}/")


if __name__ == "__main__":
    main()
