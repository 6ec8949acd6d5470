#!/usr/bin/env python
"""Heat-equation demo: Crank-Nicolson stepping with snapshots + dashboard."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (  # noqa: E402
    HeatConfig,
    heat_problems,
    solve_heat,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.visualization import (  # noqa: E402
    SolutionVisualizer,
)


def main():
    out = Path("demo_out")
    out.mkdir(exist_ok=True)

    prob = heat_problems.multiple_frequencies(65)
    cfg = HeatConfig(scheme="crank_nicolson", dtype="float64", save_every=10)
    res = solve_heat(prob, t_final=0.02, dt=0.0005, cfg=cfg)
    print(f"{prob.name}: {res.steps} steps to t={res.t:g}, "
          f"errors={res.errors}")

    viz = SolutionVisualizer()
    snaps = [(0.0, prob.initial_state("float64"))] + (res.saved or [])
    viz.plot_time_series(prob.grid, snaps[:8], save=out / "heat_series.png")
    print(f"figures in {out}/")


if __name__ == "__main__":
    main()
