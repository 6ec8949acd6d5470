#!/usr/bin/env python
"""3D Poisson walkthrough: one-call solves across the precision surface.

The reference's 3D solver was a NotImplementedError stub (reference
applications/poisson_solver.py:483-557). Here: uniform fp64, mixed
(fp32 cycles + float64 iterative refinement), adaptive staging, an
MG-preconditioned CG run, and an h-refinement study — all real solves.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (  # noqa: E402
    convergence_study3d,
    solve_poisson3d,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems3d as P3  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.preconditioning import (  # noqa: E402
    multigrid_preconditioner3d,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (  # noqa: E402
    krylov,
    multigrid3d as mg3,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)


def main():
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-10)
    prob = P3.poisson3d_mms_sinsinsin(65)

    print("-- precision surface (65^3) --")
    for prec in ("fp64", "mixed", "adaptive"):
        res = solve_poisson3d(prob, precision=prec, cfg=cfg)
        print(f"  {prec:8s}: {res.iterations:3d} iters  "
              f"l2 = {res.errors['l2']:.3e}  "
              f"method = {res.info['method'] if 'method' in res.info else 'mg'}"
              f"  {res.solve_time:.1f}s")

    print("\n-- MG-preconditioned CG on the var-coef problem (33^3) --")
    vprob = P3.varcoef3d_mms(33)
    scfg = cfg.replace(symmetric=True)
    levels = mg3.build_hierarchy3d(vprob.grid, vprob.spec, a=vprob.a,
                                   lam=vprob.lam, dtype="float64", cfg=scfg)
    mv = krylov.stencil_matvec3d(levels[0].stencil, levels[0].unknown)
    M = multigrid_preconditioner3d(levels, scfg)
    f = jnp.where(levels[0].unknown, vprob.rhs(jnp.float64), 0.0)
    u, info = krylov.pcg(mv, f, precond=M, tol=1e-10, maxiter=50)
    print(f"  pcg: converged={info['converged']} in {info['iterations']} iters")

    print("\n-- h-refinement study --")
    st = convergence_study3d(P3.poisson3d_mms_sinsinsin, [9, 17, 33],
                             precision="fp64", cfg=cfg)
    print(f"  L2 order {st['order_l2']:.2f}, H1 order {st['order_h1']:.2f}, "
          f"converged = {st['converged']}")


if __name__ == "__main__":
    main()
