"""Standalone iterative solvers (Jacobi / Gauss-Seidel / SOR / weighted Jacobi).

Counterpart of the reference's solver zoo (reference solvers/iterative.py:
EnhancedJacobiSolver:72, EnhancedGaussSeidelSolver, SORSolver:285,
WeightedJacobiSolver:346) and the generic IterativeSolver.solve loop
(reference solvers/base.py:183-290). One driver covers all of them: the
smoother kernel is a parameter, the loop is a jitted ``lax.while_loop``
checking the residual every ``check_every`` sweeps (a device-side check —
the reference synced to host per iteration).

These are diagnostic/baseline solvers: multigrid (solvers.multigrid) is the
production path; these document the smoother-alone convergence rates that the
reference's tests assert on (reference tests/unit/test_iterative_solvers.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import norms, smooth as smooth_mod, stencil as st_mod
from .multigrid import Level, convergence_factor


def jacobi_spectral_radius(nx: int, ny: int) -> float:
    """rho(Jacobi) = (cos(pi/(nx-1)) + cos(pi/(ny-1)))/2 for the 5-point
    Laplacian with hx=hy (reference iterative.py:110-121 uses the product
    form; the average is the exact value for the uniform 5-point operator)."""
    return 0.5 * (math.cos(math.pi / (nx - 1)) + math.cos(math.pi / (ny - 1)))


def optimal_weighted_jacobi_omega(nx: int, ny: int) -> float:
    """omega* = 2/(1+sqrt(1-rho^2)) for fastest *solving* (not smoothing)
    (reference iterative.py:346-362)."""
    rho = jacobi_spectral_radius(nx, ny)
    return 2.0 / (1.0 + math.sqrt(max(1.0 - rho * rho, 0.0)))


def laplacian_eigenvalues_1d(n: int, h: float) -> np.ndarray:
    """Exact eigenvalues (4/h^2) sin^2(pi k / (2(n-1))), k=1..n-2, of the 1D
    Dirichlet 5-point Laplacian (reference operators/laplacian.py:126-139)."""
    k = np.arange(1, n - 1)
    return (4.0 / h**2) * np.sin(np.pi * k / (2 * (n - 1))) ** 2


def laplacian_condition_number(nx: int, ny: int, hx: float, hy: float) -> float:
    """Exact 2-norm condition number lambda_max/lambda_min of the 2D Dirichlet
    5-point Laplacian — tensor-sum spectrum, so the extremes are the sums of
    the 1D extremes (reference operators/laplacian.py:141-158 estimates this
    as O(h^-2); this is the exact value)."""
    ex = laplacian_eigenvalues_1d(nx, hx)
    ey = laplacian_eigenvalues_1d(ny, hy)
    lmin = ex[0] + ey[0]
    lmax = ex[-1] + ey[-1]
    return float(lmax / lmin)


@partial(jax.jit, static_argnames=("method", "check_every", "max_sweeps"))
def _iter_jit(stencil, unknown, hx, hy, u0, f, omega, tol, *,
              method: str, check_every: int, max_sweeps: int):
    fnorm = norms.masked_scaled_l2(f, unknown, hx, hy)
    tol_eff = tol * jnp.maximum(fnorm, 1e-300)
    r0 = st_mod.residual(stencil, u0, f, unknown)
    rnorm0 = norms.scaled_l2(r0, hx, hy)
    n_checks = max_sweeps // check_every
    hist = jnp.full((n_checks + 1,), jnp.nan, jnp.float64)
    hist = hist.at[0].set(rnorm0)

    def cond(c):
        _, k, rnorm, _ = c
        return (rnorm > tol_eff) & (k < n_checks)

    def body(c):
        u, k, rnorm, hist = c
        u = smooth_mod.smooth(stencil, u, f, unknown, method=method,
                              sweeps=check_every, omega=float(1.0) * omega)
        r = st_mod.residual(stencil, u, f, unknown)
        rnorm = norms.scaled_l2(r, hx, hy)
        hist = hist.at[k + 1].set(rnorm)
        return (u, k + 1, rnorm, hist)

    u, k, rnorm, hist = jax.lax.while_loop(
        cond, body, (u0, jnp.asarray(0, jnp.int32), rnorm0, hist)
    )
    return u, k, rnorm, hist, rnorm <= tol_eff


def iterative_solve(
    lev: Level,
    f,
    u0=None,
    *,
    method: str = "jacobi",
    omega: float = None,
    tol: float = 1e-8,
    max_sweeps: int = 10_000,
    check_every: int = 10,
) -> Tuple[Any, Dict[str, Any]]:
    """Smoother-as-solver until ||r|| <= tol*||f||.

    method: 'jacobi' (omega default 2/3 — reference smoothers.py:16),
    'weighted_jacobi' (auto omega*), 'rbgs'/'gauss_seidel' (omega 1),
    'sor' (auto omega* = 2/(1+sin(pi h)) — reference iterative.py:285-300).
    """
    g = lev.grid
    if omega is None:
        omega = {
            "jacobi": 2.0 / 3.0,
            "weighted_jacobi": optimal_weighted_jacobi_omega(g.nx, g.ny),
            "rbgs": 1.0,
            "gauss_seidel": 1.0,
            "red_black": 1.0,
            "sor": smooth_mod.optimal_sor_omega(g.nx, g.ny),
            "line_x": 1.0,
            "line_y": 1.0,
            "adi": 1.0,
            "chebyshev": 1.0,
        }[method]
    kernel = "jacobi" if method == "weighted_jacobi" else method
    if u0 is None:
        u0 = jnp.zeros(g.shape_padded, lev.dtype)
    u, k, rnorm, hist, conv = _iter_jit(
        lev.stencil, lev.unknown, g.hx, g.hy,
        u0.astype(lev.dtype), f.astype(lev.dtype),
        jnp.asarray(omega, jnp.float32), jnp.asarray(tol, jnp.float64),
        method=kernel, check_every=check_every, max_sweeps=max_sweeps,
    )
    k = int(k)
    hist_np = np.asarray(hist)[: k + 1]
    return u, {
        "iterations": k * check_every,
        "sweeps": k * check_every,
        "residual_norm": float(rnorm),
        "history": hist_np,
        "converged": bool(conv),
        "convergence_factor": float(convergence_factor(hist_np) ** (1.0 / check_every))
        if k > 0 else float("nan"),
        "method": method,
        "omega": float(omega),
    }
