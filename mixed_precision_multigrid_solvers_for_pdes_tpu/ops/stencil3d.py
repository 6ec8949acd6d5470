"""7-point stencil operator ``A u = -div(a grad u) + lam*u`` in 3D.

3D sibling of ops/stencil.py — real 3D support the reference never shipped
(reference applications/poisson_solver.py:483-557 is a stub; its MMS suite
defines 3D problems, reference validation/mms_validation.py:183-217, but
nothing solves them). All-Dirichlet boxes only for now; Neumann/Robin follow
the 2D ghost-elimination pattern when needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.grid3d import Grid3D


@dataclasses.dataclass(frozen=True)
class Stencil3D:
    """7-point coefficients (0-d scalars on the constant fast path)."""

    c: Any   # center
    w: Any   # (i-1, j, k)
    e: Any   # (i+1, j, k)
    s: Any   # (i, j-1, k)
    n: Any   # (i, j+1, k)
    b: Any   # (i, j, k-1)
    t: Any   # (i, j, k+1)

    def astype(self, dtype) -> "Stencil3D":
        return Stencil3D(*(jnp.asarray(x, dtype) for x in
                           (self.c, self.w, self.e, self.s, self.n, self.b, self.t)))


jax.tree_util.register_dataclass(
    Stencil3D, data_fields=("c", "w", "e", "s", "n", "b", "t"), meta_fields=()
)


def unknown_mask3d(grid: Grid3D):
    """Interior (all-Dirichlet) unknowns of the padded array, iota-built."""
    pshape = grid.shape_padded
    i = jax.lax.broadcasted_iota(jnp.int32, pshape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, pshape, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, pshape, 2)
    return (
        (i > 0) & (i < grid.nx - 1)
        & (j > 0) & (j < grid.ny - 1)
        & (k > 0) & (k < grid.nz - 1)
    )


def logical_mask3d(grid: Grid3D):
    pshape = grid.shape_padded
    i = jax.lax.broadcasted_iota(jnp.int32, pshape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, pshape, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, pshape, 2)
    return (i < grid.nx) & (j < grid.ny) & (k < grid.nz)


def neighbor_sum(st: Stencil3D, u):
    return (
        st.w * jnp.roll(u, 1, 0)
        + st.e * jnp.roll(u, -1, 0)
        + st.s * jnp.roll(u, 1, 1)
        + st.n * jnp.roll(u, -1, 1)
        + st.b * jnp.roll(u, 1, 2)
        + st.t * jnp.roll(u, -1, 2)
    )


def apply(st: Stencil3D, u):
    return st.c * u - neighbor_sum(st, u)


def residual(st: Stencil3D, u, f, unknown):
    r = f - apply(st, u)
    return jnp.where(unknown, r, jnp.zeros((), r.dtype))


def make_stencil3d(
    grid: Grid3D,
    *,
    a: Optional[jnp.ndarray] = None,
    lam: Any = 0.0,
    dtype=jnp.float32,
) -> Stencil3D:
    """Build the 7-point stencil for ``-div(a grad u) + lam*u`` (Dirichlet box)."""
    ihx2 = 1.0 / (grid.hx * grid.hx)
    ihy2 = 1.0 / (grid.hy * grid.hy)
    ihz2 = 1.0 / (grid.hz * grid.hz)
    if a is None and jnp.ndim(lam) == 0:
        w = e = jnp.asarray(ihx2, dtype)
        s = n = jnp.asarray(ihy2, dtype)
        b = t = jnp.asarray(ihz2, dtype)
        c = w + e + s + n + b + t + jnp.asarray(lam, dtype)
        return Stencil3D(c=c, w=w, e=e, s=s, n=n, b=b, t=t)
    if a is None:
        aw = ae = as_ = an = ab = at = jnp.asarray(1.0, dtype)
    else:
        a = jnp.asarray(a, dtype)
        aw = 0.5 * (a + jnp.roll(a, 1, 0))
        ae = 0.5 * (a + jnp.roll(a, -1, 0))
        as_ = 0.5 * (a + jnp.roll(a, 1, 1))
        an = 0.5 * (a + jnp.roll(a, -1, 1))
        ab = 0.5 * (a + jnp.roll(a, 1, 2))
        at = 0.5 * (a + jnp.roll(a, -1, 2))
    ones = jnp.ones(grid.shape_padded, dtype)
    w = ones * (aw * ihx2)
    e = ones * (ae * ihx2)
    s = ones * (as_ * ihy2)
    n = ones * (an * ihy2)
    b = ones * (ab * ihz2)
    t = ones * (at * ihz2)
    c = w + e + s + n + b + t + jnp.asarray(lam, dtype)
    return Stencil3D(c=c, w=w, e=e, s=s, n=n, b=b, t=t)
