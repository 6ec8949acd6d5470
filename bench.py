"""Headline benchmark: 1025^2 Poisson to 1e-9 relative residual on one chip.

Mixed-precision solve (fp32 RB-GS V(2,2) cycles + fp64-accumulated residuals
via iterative refinement) — the configuration the reference benchmarks as
"GPU mixed precision 1025^2" (reference docs/results.md:271,286-292: 8.76 s
fp32 / 11.23 s mixed on an A100, final accuracy 2.7e-9).

Note on tolerance: at 1025^2 the float64 evaluation floor of the residual is
~4e-10 relative (eps64 * ||A|| * ||u|| / ||f||); 1e-9 is the tightest target
honestly reachable without compensated accumulation, and is ~3x tighter than
the reference's reported mixed-precision final accuracy.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares DoF/s against the reference's claimed A100 fp32 solve
(1025^2 / 8.76 s = 1.195e5 DoF/s, reference docs/results.md:271).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
    from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import ir_solve
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
        MultigridConfig,
    )

    n = 1025
    prob = P.poisson_mms_sinsin(n)
    cfg = MultigridConfig(
        smoother="rbgs", omega=1.0, tol=1e-9, backend="auto", max_iterations=40
    )
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32", cfg=cfg)
    f = prob.rhs(jnp.float64)
    u0 = prob.initial_guess(jnp.float64)

    # warmup / compile
    u, info = ir_solve(levels, f, u0, cfg, inner_cycles=2, use_fmg=True)
    assert info["converged"], info

    # min over runs: the axon tunnel's fixed per-execution cost jitters by
    # +-40% run to run, which a mean smears into the result
    runs = 7
    dt = float("inf")
    for _ in range(runs):
        t0 = time.time()
        u, info = ir_solve(levels, f, u0, cfg, inner_cycles=2, use_fmg=True)
        dt = min(dt, time.time() - t0)

    dofs = (n - 2) ** 2
    dof_per_s = dofs / dt
    ref_dof_per_s = 1025**2 / 8.76  # reference A100 fp32 claim
    print(
        json.dumps(
            {
                "metric": "poisson_1025sq_mixed_precision_solve_DoF_per_s",
                "value": round(dof_per_s, 1),
                "unit": "DoF/s",
                "vs_baseline": round(dof_per_s / ref_dof_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
