"""High-level Poisson/elliptic frontend.

Counterpart of the reference's ``PoissonSolver2D`` facade
(reference applications/poisson_solver.py:35-460): solve a Problem with one
call, pick precision/backend, measure errors, and run grid-convergence
studies with observed-order fits.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision, PrecisionPolicy, as_dtype, policy as make_policy
from ..models.problems import Problem
from ..solvers import multigrid as mg_mod, refinement
from ..solvers.multigrid import MultigridConfig


@dataclasses.dataclass
class PoissonResult:
    """Solution + solve metadata (reference poisson_solver.py:118-189 returns
    a similar dict; a typed record is friendlier)."""

    u: Any
    info: Dict[str, Any]
    errors: Optional[Dict[str, float]] = None
    solve_time: float = 0.0

    @property
    def iterations(self) -> int:
        return self.info["iterations"]

    @property
    def converged(self) -> bool:
        return self.info["converged"]


def solve_poisson(
    problem: Problem,
    *,
    precision: Any = "fp32",
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0),
    use_fmg: bool = False,
) -> PoissonResult:
    """Solve ``A u = f`` for a models.problems.Problem.

    precision:
      'fp32'/'fp64'/'bf16' — uniform solve at that dtype.
      'mixed'              — per-level dtypes (fine fp32, coarse bf16) with a
                             float64 outer residual via iterative refinement.
      'adaptive'           — staged promotion (solvers.refinement.adaptive_solve).
      a PrecisionPolicy    — used directly.
    """
    if isinstance(precision, PrecisionPolicy):
        pol = precision
    else:
        pol = make_policy(precision) if isinstance(precision, str) else make_policy("fp32")

    t0 = time.perf_counter()
    if pol.mode == Precision.ADAPTIVE:
        u, info = refinement.adaptive_solve(
            problem.grid, problem.spec, problem.rhs(jnp.float64),
            problem.initial_guess(jnp.float64),
            a=problem.a, lam=problem.lam, domain=problem.domain,
            policy=pol, cfg=cfg,
        )
    elif pol.mode == Precision.MIXED:
        levels = mg_mod.build_hierarchy(
            problem.grid, problem.spec, a=problem.a, lam=problem.lam,
            domain=problem.domain, policy=pol, cfg=cfg,
        )
        u, info = refinement.ir_solve(
            levels, problem.rhs(jnp.float64), problem.initial_guess(jnp.float64),
            cfg, inner_cycles=2,
        )
    else:
        dt = pol.mode.dtype
        levels = mg_mod.build_hierarchy(
            problem.grid, problem.spec, a=problem.a, lam=problem.lam,
            domain=problem.domain, dtype=dt, cfg=cfg,
        )
        if dt == jnp.float32 and cfg.tol < 1e-6:
            # fp32 cycles cannot reach below ~1e-7 relative; wrap in IR
            u, info = refinement.ir_solve(
                levels, problem.rhs(jnp.float64),
                problem.initial_guess(jnp.float64), cfg, inner_cycles=2,
            )
        else:
            u, info = mg_mod.mg_solve(
                levels, problem.rhs(dt), problem.initial_guess(dt), cfg,
                use_fmg=use_fmg,
            )
    jax.block_until_ready(u)
    dt_solve = time.perf_counter() - t0

    errors = problem.error_norms(u) if problem.exact is not None else None
    return PoissonResult(u=u, info=info, errors=errors, solve_time=dt_solve)


def observed_order(hs: np.ndarray, errs: np.ndarray) -> float:
    """Least-squares slope of log(err) vs log(h)
    (reference poisson_solver.py:315-396 computes pairwise orders; the
    regression over the whole ladder is more robust)."""
    hs, errs = np.asarray(hs, float), np.asarray(errs, float)
    good = errs > 0
    if good.sum() < 2:
        return float("nan")
    return float(np.polyfit(np.log(hs[good]), np.log(errs[good]), 1)[0])


def convergence_study(
    problem_factory: Callable[[int], Problem],
    sizes: List[int],
    *,
    precision: Any = "fp64",
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0),
) -> Dict[str, Any]:
    """h-refinement study: solve on a grid ladder, fit the observed order.

    Returns {'sizes', 'h', 'l2', 'linf', 'order_l2', 'order_linf', 'iterations'}
    (reference poisson_solver.py:315-396, mms_validation.py:279-553)."""
    rows = []
    for n in sizes:
        prob = problem_factory(n)
        res = solve_poisson(prob, precision=precision, cfg=cfg)
        if prob.exact is None:
            raise ValueError("convergence study needs exact solutions")
        rows.append(
            dict(n=n, h=max(prob.grid.hx, prob.grid.hy),
                 iterations=res.iterations, converged=res.converged,
                 **res.errors)
        )
    h = np.array([r["h"] for r in rows])
    l2 = np.array([r["l2"] for r in rows])
    linf = np.array([r["linf"] for r in rows])
    pairwise = list(np.log(l2[:-1] / l2[1:]) / np.log(h[:-1] / h[1:]))
    return {
        "sizes": list(sizes),
        "h": h,
        "l2": l2,
        "linf": linf,
        "iterations": [r["iterations"] for r in rows],
        "converged": all(r["converged"] for r in rows),
        "order_l2": observed_order(h, l2),
        "order_linf": observed_order(h, linf),
        "pairwise_orders": pairwise,
    }
