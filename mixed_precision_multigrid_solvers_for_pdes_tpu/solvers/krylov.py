"""Preconditioned Krylov solvers (CG / BiCGStab / GMRES), jit-first.

The reference wraps multigrid as a preconditioner for outer Krylov iterations
(reference preconditioning/multigrid_preconditioner.py:20) and benchmarks
against scipy CG/GMRES (reference validation/performance_baselines.py:129-539).
Here the Krylov loop itself is a ``lax.while_loop`` over whole-array ops —
dot products accumulate in float64, matvec is the stencil apply, and the
preconditioner is any pure callable z = M(r) (see ``preconditioning``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencil as st_mod


def _dot(a, b):
    return jnp.sum(a.astype(jnp.float64) * b.astype(jnp.float64))


def _safe_div(num, den, tiny: float = 1e-300):
    """num/den with sign-preserving underflow guard (den may be negative —
    clamping with max() would flip exploding signs into NaNs)."""
    den = jnp.where(jnp.abs(den) < tiny, jnp.where(den < 0, -tiny, tiny), den)
    return num / den


def stencil_matvec(stencil, unknown, sync=None):
    """matvec for the masked stencil operator: zero off unknown nodes.
    ``sync`` refreshes periodic wrap ghosts before the neighbor reads."""

    def mv(x):
        if sync is not None:
            x = sync(x)
        return jnp.where(unknown, st_mod.apply(stencil, x), jnp.zeros((), x.dtype))

    return mv


@partial(jax.jit, static_argnames=("matvec", "precond", "maxiter"))
def _pcg_jit(matvec, precond, b, x0, tol, maxiter: int):
    x = x0
    r = b - matvec(x)
    z = precond(r)
    p = z
    rz = _dot(r, z)
    bnorm = jnp.sqrt(_dot(b, b))
    tol_eff = tol * jnp.maximum(bnorm, 1e-300)
    hist = jnp.full((maxiter + 1,), jnp.nan, jnp.float64)
    hist = hist.at[0].set(jnp.sqrt(_dot(r, r)))

    def cond(c):
        _, _, _, _, rnorm, k, _ = c
        return (rnorm > tol_eff) & (k < maxiter)

    def body(c):
        x, r, p, rz, rnorm, k, hist = c
        Ap = matvec(p)
        alpha = _safe_div(rz, _dot(p, Ap)).astype(x.dtype)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = _dot(r, z)
        beta = _safe_div(rz_new, rz).astype(x.dtype)
        p = z + beta * p
        rnorm = jnp.sqrt(_dot(r, r))
        hist = hist.at[k + 1].set(rnorm)
        return (x, r, p, rz_new, rnorm, k + 1, hist)

    x, r, p, rz, rnorm, k, hist = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.sqrt(_dot(r, r)), jnp.asarray(0, jnp.int32), hist)
    )
    return x, k, rnorm, hist, rnorm <= tol_eff


def pcg(
    matvec: Callable,
    b,
    x0=None,
    *,
    precond: Optional[Callable] = None,
    tol: float = 1e-10,
    maxiter: int = 500,
) -> Tuple[Any, Dict[str, Any]]:
    """Preconditioned conjugate gradients with residual history.

    ``matvec``/``precond`` must be pure jax callables (hashable — use
    functools.partial or module functions, not fresh lambdas per call, to
    avoid recompiles)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = _identity
    x, k, rnorm, hist, conv = _pcg_jit(
        matvec, precond, b, x0, jnp.asarray(tol, jnp.float64), maxiter
    )
    k = int(k)
    return x, {
        "iterations": k,
        "residual_norm": float(rnorm),
        "history": np.asarray(hist)[: k + 1],
        "converged": bool(conv),
        "method": "pcg",
    }


def _identity(r):
    return r


@partial(jax.jit, static_argnames=("matvec", "precond", "maxiter"))
def _bicgstab_jit(matvec, precond, b, x0, tol, maxiter: int):
    x = x0
    r = b - matvec(x)
    rhat = r
    bnorm = jnp.sqrt(_dot(b, b))
    tol_eff = tol * jnp.maximum(bnorm, 1e-300)
    hist = jnp.full((maxiter + 1,), jnp.nan, jnp.float64)
    hist = hist.at[0].set(jnp.sqrt(_dot(r, r)))
    rho = alpha = omega = jnp.asarray(1.0, jnp.float64)
    v = p = jnp.zeros_like(r)

    def cond(c):
        return (c[-2] > tol_eff) & (c[-3] < maxiter)

    def body(c):
        x, r, v, p, rho, alpha, omega, hist, k, rnorm, _ = c
        rho_new = _dot(rhat, r)
        beta = _safe_div(rho_new, rho) * _safe_div(alpha, omega)
        p = r + beta.astype(r.dtype) * (p - omega.astype(r.dtype) * v)
        phat = precond(p)
        v = matvec(phat)
        alpha = _safe_div(rho_new, _dot(rhat, v))
        s = r - alpha.astype(r.dtype) * v
        shat = precond(s)
        t = matvec(shat)
        omega = _safe_div(_dot(t, s), _dot(t, t))
        x = x + alpha.astype(x.dtype) * phat + omega.astype(x.dtype) * shat
        r = s - omega.astype(r.dtype) * t
        rnorm = jnp.sqrt(_dot(r, r))
        hist = hist.at[k + 1].set(rnorm)
        return (x, r, v, p, rho_new, alpha, omega, hist, k + 1, rnorm, tol_eff)

    init = (x, r, v, p, rho, alpha, omega, hist,
            jnp.asarray(0, jnp.int32), jnp.sqrt(_dot(r, r)), tol_eff)
    out = jax.lax.while_loop(cond, body, init)
    x, r, _, _, _, _, _, hist, k, rnorm, _ = out
    return x, k, rnorm, hist, rnorm <= tol_eff


def bicgstab(
    matvec: Callable,
    b,
    x0=None,
    *,
    precond: Optional[Callable] = None,
    tol: float = 1e-10,
    maxiter: int = 500,
) -> Tuple[Any, Dict[str, Any]]:
    """Preconditioned BiCGStab (for nonsymmetric operators, e.g. upwinded or
    Robin-modified stencils)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = _identity
    x, k, rnorm, hist, conv = _bicgstab_jit(
        matvec, precond, b, x0, jnp.asarray(tol, jnp.float64), maxiter
    )
    k = int(k)
    return x, {
        "iterations": k,
        "residual_norm": float(rnorm),
        "history": np.asarray(hist)[: k + 1],
        "converged": bool(conv),
        "method": "bicgstab",
    }


def gmres(
    matvec: Callable,
    b,
    x0=None,
    *,
    precond: Optional[Callable] = None,
    tol: float = 1e-10,
    restart: int = 30,
    maxiter: int = 500,
) -> Tuple[Any, Dict[str, Any]]:
    """Restarted GMRES via jax.scipy.sparse.linalg.gmres (left-preconditioned).

    jax's gmres does not expose a residual history; the returned info holds
    the final true residual only."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    M = precond if precond is not None else _identity
    x, _ = jax.scipy.sparse.linalg.gmres(
        matvec, b, x0=x0, tol=tol, restart=restart,
        maxiter=max(1, maxiter // restart), M=M, solve_method="batched",
    )
    r = b - matvec(x)
    rnorm = float(jnp.sqrt(_dot(r, r)))
    bnorm = float(jnp.sqrt(_dot(b, b)))
    return x, {
        "iterations": -1,
        "residual_norm": rnorm,
        "history": np.asarray([rnorm]),
        "converged": rnorm <= tol * max(bnorm, 1e-300),
        "method": "gmres",
    }
