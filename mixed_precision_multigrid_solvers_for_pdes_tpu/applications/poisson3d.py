"""High-level 3D Poisson/elliptic frontend.

3D sibling of :mod:`applications.poisson` — the reference's ``PoissonSolver3D``
was a NotImplementedError stub plus a memory estimator (reference
applications/poisson_solver.py:483-557); here the full precision surface
(uniform / mixed-IR) and grid-convergence studies run for real, optionally
SPMD over a device mesh.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp

from ..core.precision import Precision, PrecisionPolicy, policy as make_policy
from ..models.problems3d import Problem3D
from ..solvers import multigrid3d as mg3
from ..solvers.multigrid import MultigridConfig
from .poisson import PoissonResult, fit_study


def solve_poisson3d(
    problem: Problem3D,
    *,
    precision: Any = "fp32",
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0),
    mesh=None,
) -> PoissonResult:
    """Solve the 3D problem with one call.

    precision:
      'fp32'/'fp64'/'bf16' — uniform solve at that dtype.
      'mixed'              — fp32 cycles under float64 iterative refinement
                             (solvers.multigrid3d.ir_solve3d).
      'adaptive'           — staged promotion
                             (solvers.refinement.adaptive_solve3d).

    ``mesh`` (jax.sharding.Mesh) runs the solve SPMD: (x, y) block-partitioned,
    z kept local (the lane axis and the line-smoother direction stay
    on-device — parallel.mesh.grid_sharding3d)."""
    pol = precision if isinstance(precision, PrecisionPolicy) \
        else make_policy(precision)

    def _constrain():
        if mesh is None:
            return None
        from ..parallel.distributed import make_constrainer3d
        return make_constrainer3d(mesh)

    def _shard(*arrays):
        if mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        from ..parallel.mesh import grid_sharding3d
        sh = grid_sharding3d(mesh, problem.grid)
        out = tuple(jax.device_put(a, sh) for a in arrays)
        return out if len(out) > 1 else out[0]

    t0 = time.perf_counter()
    if pol.mode == Precision.ADAPTIVE:
        from ..solvers.refinement import adaptive_solve3d

        u, info = adaptive_solve3d(
            problem.grid, problem.spec, problem.rhs(jnp.float64),
            problem.initial_guess(jnp.float64),
            a=problem.a, lam=problem.lam, policy=pol, cfg=cfg, mesh=mesh,
        )
    else:
        dt = None if pol.mode == Precision.MIXED else pol.mode.dtype
        if dt == jnp.float32 and cfg.tol < 1e-6:
            # fp32 residual evaluation floors near ~1e-7 relative; wrap the
            # cycles in float64 IR (matches solve_poisson, poisson.py:107)
            dt = None
        if dt is None:
            # per-level dtypes (fine fp32 / coarse bf16 under 'mixed') when a
            # policy drove us here; plain fp32 ladder for tight-tol uniform
            pol_levels = pol if pol.mode == Precision.MIXED else None
            levels = mg3.build_hierarchy3d(problem.grid, problem.spec,
                                           a=problem.a, lam=problem.lam,
                                           dtype="float32", policy=pol_levels,
                                           cfg=cfg)
            f64, u64 = _shard(problem.rhs(jnp.float64),
                              problem.initial_guess(jnp.float64))
            u, info = mg3.ir_solve3d(levels, f64, u64, cfg, inner_cycles=2,
                                     constrain=_constrain())
        else:
            levels = mg3.build_hierarchy3d(problem.grid, problem.spec,
                                           a=problem.a, lam=problem.lam,
                                           dtype=dt, cfg=cfg)
            fd, ud = _shard(problem.rhs(dt), problem.initial_guess(dt))
            u, info = mg3.mg_solve3d(levels, fd, ud, cfg,
                                     constrain=_constrain())
    jax.block_until_ready(u)
    dt_solve = time.perf_counter() - t0

    errors = problem.error_norms(u) if problem.exact is not None else None
    return PoissonResult(u=u, info=info, errors=errors, solve_time=dt_solve)


def convergence_study3d(
    problem_factory: Callable[[int], Problem3D],
    sizes: List[int],
    *,
    precision: Any = "fp64",
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0),
) -> Dict[str, Any]:
    """3D h-refinement study with observed-order fits (2D sibling:
    applications.poisson.convergence_study)."""
    rows = []
    for n in sizes:
        prob = problem_factory(n)
        res = solve_poisson3d(prob, precision=precision, cfg=cfg)
        if prob.exact is None:
            raise ValueError("convergence study needs exact solutions")
        rows.append(dict(n=n, h=max(prob.grid.hx, prob.grid.hy, prob.grid.hz),
                         iterations=res.iterations, converged=res.converged,
                         **res.errors))
    return fit_study(list(sizes), rows)
