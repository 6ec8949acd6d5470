#!/usr/bin/env python
"""Galerkin (RAP) coarsening demo: jump-coefficient robustness.

Solves -div(a grad u) = 1 with a 1e3:1 coefficient jump at x = 0.5 under
both coarse-operator constructions and prints the measured per-cycle
convergence factors. The reference's number for this problem class
(rho 0.142) came from its simulated benchmark layer (reference
benchmarks/validation_suite.py:256-300); both rows here are real solves.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)


def main():
    for ratio in (1e3, 1e6):
        prob = P.jump_coefficient_problem(257, ratio=ratio)
        print(f"\n-- coefficient jump {ratio:g}:1 at x = 0.5 (257^2) --")
        for coarsening, cycle in (("rediscretize", "W"), ("galerkin", "V"),
                                  ("galerkin", "W")):
            cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-10,
                                  coarsening=coarsening, cycle=cycle)
            levels = mg.build_hierarchy(prob.grid, prob.spec, a=prob.a,
                                        dtype="float64", cfg=cfg)
            u, info = mg.mg_solve(levels, prob.rhs(jnp.float64), None, cfg)
            print(f"  {coarsening:13s} {cycle}-cycle: "
                  f"{int(info['iterations']):2d} iters, "
                  f"rho = {info['convergence_factor']:.4f}")


if __name__ == "__main__":
    main()
