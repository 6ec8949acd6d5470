"""7-point stencil operator ``A u = -div(a grad u) + lam*u`` in 3D.

3D sibling of ops/stencil.py — real 3D support the reference never shipped
(reference applications/poisson_solver.py:483-557 is a stub; its MMS suite
defines 3D problems, reference validation/mms_validation.py:183-217, but
nothing solves them). Full BC support via core/bc3d.BoundarySpec3D:
Dirichlet / Neumann / Robin ghost elimination / periodic, mirroring the 2D
design in ops/stencil.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core import bc3d as bc3
from ..core.bc import BCKind
from ..core.bc3d import BoundarySpec3D
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


# the 26 off-center offsets of a 3x3x3 box, in a fixed canonical order
OFFSETS27 = tuple(
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
    if (dx, dy, dz) != (0, 0, 0)
)


@dataclasses.dataclass(frozen=True)
class Stencil27:
    """27-point stencil: diagonal field + stacked off-diagonal couplings.

    ``A u = c*u - sum_i off[i] * u_{+OFFSETS27[i]}`` (same sign convention
    as Stencil3D). Produced by Galerkin (RAP) coarsening of the 7-point
    operator under full-weighting + trilinear transfers (ops/galerkin.py);
    27-point is closed under further RAP. The stacked ``off`` array has
    shape ``(26,) + pshape``.
    """

    c: Any
    off: Any

    def astype(self, dtype) -> "Stencil27":
        return Stencil27(jnp.asarray(self.c, dtype),
                         jnp.asarray(self.off, dtype))


jax.tree_util.register_dataclass(
    Stencil27, data_fields=("c", "off"), meta_fields=()
)


def coupling(st, d):
    """The coupling-coefficient field toward offset ``d = (dx, dy, dz)``."""
    if isinstance(st, Stencil27):
        return st.off[OFFSETS27.index(d)]
    return {
        (-1, 0, 0): st.w, (1, 0, 0): st.e,
        (0, -1, 0): st.s, (0, 1, 0): st.n,
        (0, 0, -1): st.b, (0, 0, 1): st.t,
    }[d]


def unknown_mask3d(grid: Grid3D, spec: Optional[BoundarySpec3D] = None):
    """Spec-aware unknowns (default: all-Dirichlet box), iota-built."""
    return bc3.unknown_mask3d(grid, spec or BoundarySpec3D())


def logical_mask3d(grid: Grid3D):
    pshape = grid.shape_padded
    i = jax.lax.broadcasted_iota(jnp.int32, pshape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, pshape, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, pshape, 2)
    return (i < grid.nx) & (j < grid.ny) & (k < grid.nz)


def neighbor_sum(st, u):
    if isinstance(st, Stencil27):
        out = jnp.zeros_like(u)
        for i, (dx, dy, dz) in enumerate(OFFSETS27):
            out = out + st.off[i] * jnp.roll(u, (-dx, -dy, -dz), (0, 1, 2))
        return out
    return (
        st.w * jnp.roll(u, 1, 0)
        + st.e * jnp.roll(u, -1, 0)
        + st.s * jnp.roll(u, 1, 1)
        + st.n * jnp.roll(u, -1, 1)
        + st.b * jnp.roll(u, 1, 2)
        + st.t * jnp.roll(u, -1, 2)
    )


def apply(st, u):
    return st.c * u - neighbor_sum(st, u)


def residual(st: Stencil3D, u, f, unknown, sync=None):
    if sync is not None:
        u = sync(u)
    r = f - apply(st, u)
    return jnp.where(unknown, r, jnp.zeros((), r.dtype))


def make_stencil3d(
    grid: Grid3D,
    spec: BoundarySpec3D = BoundarySpec3D(),
    *,
    a: Optional[jnp.ndarray] = None,
    lam: Any = 0.0,
    dtype=jnp.float32,
) -> Stencil3D:
    """Build the 7-point stencil for ``-div(a grad u) + lam*u``.

    Neumann/Robin faces fold the eliminated ghost point into the edge
    coefficients (normal coupling -> 0, opposite doubled, Robin adds
    2*alpha/(beta*h) to the diagonal), mirroring ops/stencil.py:101-187."""
    spec.validate()
    ihx2 = 1.0 / (grid.hx * grid.hx)
    ihy2 = 1.0 / (grid.hy * grid.hy)
    ihz2 = 1.0 / (grid.hz * grid.hz)
    plain = all(
        spec.side(sname).kind in (BCKind.DIRICHLET, BCKind.PERIODIC)
        for sname in bc3.SIDES3D
    )
    if a is None and jnp.ndim(lam) == 0 and plain:
        w = e = jnp.asarray(ihx2, dtype)
        s = n = jnp.asarray(ihy2, dtype)
        b = t = jnp.asarray(ihz2, dtype)
        c = w + e + s + n + b + t + jnp.asarray(lam, dtype)
        return Stencil3D(c=c, w=w, e=e, s=s, n=n, b=b, t=t)
    if a is None:
        aw = ae = as_ = an = ab = at = jnp.asarray(1.0, dtype)
    else:
        a = jnp.asarray(a, dtype)

        def face(an_):  # harmonic means, cf. ops/stencil.py:147-150
            ssum = a + an_
            return jnp.where(ssum > 0, 2.0 * a * an_ /
                             jnp.where(ssum > 0, ssum, 1.0),
                             jnp.zeros((), dtype))

        aw = face(jnp.roll(a, 1, 0))
        ae = face(jnp.roll(a, -1, 0))
        as_ = face(jnp.roll(a, 1, 1))
        an = face(jnp.roll(a, -1, 1))
        ab = face(jnp.roll(a, 1, 2))
        at = face(jnp.roll(a, -1, 2))
    ones = jnp.ones(grid.shape_padded, dtype)
    coefs = {
        "w": ones * (aw * ihx2), "e": ones * (ae * ihx2),
        "s": ones * (as_ * ihy2), "n": ones * (an * ihy2),
        "b": ones * (ab * ihz2), "t": ones * (at * ihz2),
    }
    robin_diag = jnp.zeros(grid.shape_padded, dtype)
    for name, h, normal, opposite in (
        ("west", grid.hx, "w", "e"), ("east", grid.hx, "e", "w"),
        ("south", grid.hy, "s", "n"), ("north", grid.hy, "n", "s"),
        ("bottom", grid.hz, "b", "t"), ("top", grid.hz, "t", "b"),
    ):
        side = spec.side(name)
        if side.kind not in (BCKind.NEUMANN, BCKind.ROBIN):
            continue
        m = bc3.side_mask3d(name, grid)
        coefs[opposite] = jnp.where(m, 2.0 * coefs[opposite], coefs[opposite])
        coefs[normal] = jnp.where(m, jnp.zeros((), dtype), coefs[normal])
        if side.kind == BCKind.ROBIN:
            robin_diag = robin_diag + jnp.where(
                m, jnp.asarray(2.0 * side.alpha / (side.beta * h), dtype), 0.0)
    c = (coefs["w"] + coefs["e"] + coefs["s"] + coefs["n"] + coefs["b"]
         + coefs["t"] + jnp.asarray(lam, dtype) + robin_diag)
    return Stencil3D(c=c, w=coefs["w"], e=coefs["e"], s=coefs["s"],
                     n=coefs["n"], b=coefs["b"], t=coefs["t"])


def bc_rhs_correction3d(
    grid: Grid3D,
    spec: BoundarySpec3D,
    bc_values: Dict[str, Any],
    dtype=jnp.float32,
):
    """Additive RHS term from Neumann/Robin data g: 2*g/(beta*h) per face
    (cf. ops/stencil.py bc_rhs_correction)."""
    out = jnp.zeros(grid.shape_padded, dtype)
    for name, h in (("west", grid.hx), ("east", grid.hx),
                    ("south", grid.hy), ("north", grid.hy),
                    ("bottom", grid.hz), ("top", grid.hz)):
        side = spec.side(name)
        if side.kind not in (BCKind.NEUMANN, BCKind.ROBIN):
            continue
        g = jnp.asarray(bc_values.get(name, 0.0), dtype)
        m = bc3.side_mask3d(name, grid)
        out = out + jnp.where(m, 2.0 * g / (side.beta * h), 0.0)
    return out
