#!/usr/bin/env python
"""Irregular-domain and singular-corner walkthrough.

Three problem classes from the reference's catalogue (reference
applications/test_problems.py:161-295) that the reference defined but never
validated against a real solver:

1. boundary_layer (eps = 0.05): full O(h^2) once the layer is resolved.
2. corner_singularity: u = r^(2/3) sin(2 theta/3) — reduced L2 order, and the
   discrete H1-seminorm order measures the sharp theoretical value 2/3.
3. l_shaped: the classic re-entrant-corner benchmark on a masked domain
   (cut nodes are Dirichlet-fixed via the unknown-mask machinery —
   core/domain.py); L2 order ~4/3, H1 order 2/3, h-independent iterations.

Each study is a ladder of REAL multigrid solves.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (  # noqa: E402
    convergence_study,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)


def main():
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-10)
    cases = [
        ("boundary_layer  (eps=0.05)", P.boundary_layer_problem, "~2.0"),
        ("corner_singularity r^(2/3)", P.corner_singularity_problem, "<2 (L2), 2/3 (H1)"),
        ("l_shaped re-entrant corner", P.l_shaped_problem, "~4/3 (L2), 2/3 (H1)"),
    ]
    for label, factory, expect in cases:
        st = convergence_study(factory, [33, 65, 129], precision="fp64",
                               cfg=cfg)
        print(f"\n-- {label} --  expected order {expect}")
        for n, l2, h1, it in zip(st["sizes"], st["l2"], st["h1"],
                                 st["iterations"]):
            print(f"  {n:4d}^2: l2 = {l2:.3e}  h1 = {h1:.3e}  iters = {it}")
        print(f"  observed: L2 order {st['order_l2']:.2f}, "
              f"H1 order {st['order_h1']:.2f}, "
              f"converged = {st['converged']}")


if __name__ == "__main__":
    main()
