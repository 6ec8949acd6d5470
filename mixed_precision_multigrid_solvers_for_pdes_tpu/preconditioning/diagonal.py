"""Diagonal (Jacobi) and line (block-tridiagonal) preconditioners.

Counterpart of reference preconditioning/diagonal.py:16-312
(DiagonalPreconditioner, ScaledDiagonalPreconditioner,
BlockDiagonalPreconditioner). The reference's block-diagonal solves row/column
tridiagonal blocks with scipy; here lines are solved with
``jax.lax.linalg.tridiagonal_solve`` — batched over the perpendicular axis,
which maps the whole sweep onto one fused device op.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.stencil import Stencil


def diagonal(st: Stencil, unknown, *, regularization: float = 0.0) -> Callable:
    """Jacobi preconditioner z = r / diag(A)
    (reference diagonal.py:16-128, incl. the regularization epsilon)."""

    def apply(r):
        d = st.c + jnp.asarray(regularization, r.dtype)
        z = r / d
        return jnp.where(unknown, z, jnp.zeros((), r.dtype))

    return apply


def scaled_diagonal(st: Stencil, unknown, *, scale: float = 1.0) -> Callable:
    """omega * D^{-1} (reference diagonal.py:130-174)."""
    base = diagonal(st, unknown)

    def apply(r):
        return jnp.asarray(scale, r.dtype) * base(r)

    return apply


def block_line(st: Stencil, unknown, *, axis: int = 0) -> Callable:
    """Line preconditioner: exact tridiagonal solve along ``axis`` with the
    couplings in the other direction dropped (block-diagonal by lines —
    reference diagonal.py:176-312). Strong for anisotropic problems when the
    line direction follows the strong coupling.

    axis=0: solve x-lines (couplings w/e kept);
    axis=1: solve y-lines (couplings s/n kept).
    """

    from ..ops.tridiag import tridiagonal_solve

    def apply(r):
        dtype = r.dtype
        ones = jnp.ones(r.shape, dtype)
        c = st.c * ones
        if axis == 0:
            dl, du = -(st.w * ones), -(st.e * ones)
        else:
            dl, du = -(st.s * ones), -(st.n * ones)
        b = jnp.where(unknown, r, jnp.zeros((), dtype))
        # neutralize rows off the unknown mask: identity equations
        dl = jnp.where(unknown, dl, jnp.zeros((), dtype))
        du = jnp.where(unknown, du, jnp.zeros((), dtype))
        d = jnp.where(unknown, c, jnp.ones((), dtype))
        z = tridiagonal_solve(dl, d, du, b, axis=axis)
        return jnp.where(unknown, z, jnp.zeros((), dtype))

    return apply
