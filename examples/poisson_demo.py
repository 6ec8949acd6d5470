#!/usr/bin/env python
"""Poisson demo: solve, verify against the exact solution, plot.

Counterpart of the reference's interactive_demo.py / generate_plots.py entry
points. Writes figures to ./demo_out/.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (  # noqa: E402
    solve_poisson,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.poisson import (  # noqa: E402
    convergence_study,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.visualization import (  # noqa: E402
    ConvergencePlotter,
    SolutionVisualizer,
)


def main():
    out = Path("demo_out")
    out.mkdir(exist_ok=True)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-10)

    prob = P.poisson_mms_sinsin(129)
    res = solve_poisson(prob, precision="mixed", cfg=cfg)
    print(f"solved {prob.name}: {res.iterations} iterations, "
          f"converged={res.converged}, errors={res.errors}, "
          f"{res.solve_time:.3f}s")

    viz = SolutionVisualizer()
    viz.plot_comparison(prob.grid, res.u, prob.exact,
                        save=out / "poisson_solution.png")
    viz.plot_error_map(prob.grid, res.u, prob.exact,
                       save=out / "poisson_error.png")

    cp = ConvergencePlotter()
    cp.plot_residual_history({"mixed V(2,2)": res.info["history"]},
                             tol=cfg.tol, save=out / "poisson_residuals.png")

    study = convergence_study(P.poisson_mms_sinsin, [17, 33, 65, 129],
                              precision="fp64", cfg=cfg)
    print(f"grid convergence: observed order {study['order_l2']:.3f}")
    cp.plot_mms_study(study, save=out / "poisson_convergence.png")
    print(f"figures in {out}/")


if __name__ == "__main__":
    main()
