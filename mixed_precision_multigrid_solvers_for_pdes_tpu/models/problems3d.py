"""3D MMS problems — solved for real (the reference defined 3D MMS problems,
reference validation/mms_validation.py:183-217, but had no 3D solver)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.bc import BCKind
from ..core.bc3d import BoundarySpec3D, SIDES3D
from ..core.grid3d import Grid3D
from ..ops import norms
from ..ops import stencil3d as st3

PI = np.pi


def eval_padded3(grid: Grid3D, fn: Callable, dtype=np.float64) -> np.ndarray:
    X, Y, Z = grid.coordinates(padded=True)
    vals = np.asarray(fn(X, Y, Z), dtype=dtype)
    vals = np.broadcast_to(vals, X.shape).copy()
    vals[grid.nx:, :, :] = 0.0
    vals[:, grid.ny:, :] = 0.0
    vals[:, :, grid.nz:] = 0.0
    return vals


@dataclasses.dataclass
class Problem3D:
    name: str
    grid: Grid3D
    f: Any = None
    a: Any = None
    lam: Any = 0.0
    exact: Any = None
    dirichlet_values: Any = None
    spec: BoundarySpec3D = BoundarySpec3D()
    bc_values: Optional[Dict[str, Any]] = None  # Neumann/Robin g per face

    def rhs(self, dtype=jnp.float32):
        f = jnp.asarray(self.f, dtype)
        if self.bc_values:
            f = f + st3.bc_rhs_correction3d(self.grid, self.spec,
                                            self.bc_values, dtype)
        return f

    def initial_guess(self, dtype=jnp.float32):
        u0 = jnp.zeros(self.grid.shape_padded, dtype)
        has_dirichlet = any(self.spec.side(s).kind == BCKind.DIRICHLET
                            for s in SIDES3D)
        if self.dirichlet_values is not None and has_dirichlet:
            g = self.grid
            fixed = st3.logical_mask3d(g) & ~st3.unknown_mask3d(g, self.spec)
            u0 = jnp.where(fixed, jnp.asarray(self.dirichlet_values, dtype), u0)
        return u0

    def error_norms(self, u) -> Dict[str, float]:
        g = self.grid
        mask = st3.logical_mask3d(g)
        diff = jnp.where(mask, u.astype(jnp.float64) - jnp.asarray(self.exact), 0.0)
        return {
            "l2": float(jnp.sqrt(g.hx * g.hy * g.hz * jnp.sum(diff * diff))),
            "linf": float(jnp.max(jnp.abs(diff))),
            "h1": float(norms.h1_seminorm3d(diff, mask, g.hx, g.hy, g.hz)),
        }


def from_callables3(name, grid, *, u_exact=None, f, a=None, lam=0.0,
                    spec=BoundarySpec3D(), bc_values=None) -> Problem3D:
    exact = eval_padded3(grid, u_exact) if u_exact is not None else None
    return Problem3D(
        name=name, grid=grid,
        f=eval_padded3(grid, f),
        a=eval_padded3(grid, a) if a is not None else None,
        lam=lam, exact=exact,
        dirichlet_values=exact,
        spec=spec, bc_values=bc_values,
    )


def poisson3d_mms_sinsinsin(n: int) -> Problem3D:
    """u = sin(pi x) sin(pi y) sin(pi z), f = 3 pi^2 u
    (reference mms_validation.py:183-199 'poisson3d_trig')."""
    grid = Grid3D(n, n, n)
    return from_callables3(
        "poisson3d_sinsinsin", grid,
        u_exact=lambda X, Y, Z: np.sin(PI * X) * np.sin(PI * Y) * np.sin(PI * Z),
        f=lambda X, Y, Z: 3 * PI**2 * np.sin(PI * X) * np.sin(PI * Y) * np.sin(PI * Z),
    )


def poisson3d_mms_polynomial(n: int) -> Problem3D:
    """u = x(1-x)y(1-y)z(1-z), f = 2[y(1-y)z(1-z)+x(1-x)z(1-z)+x(1-x)y(1-y)]
    (reference mms_validation.py:201-217 'poisson3d_poly')."""
    grid = Grid3D(n, n, n)

    def u(X, Y, Z):
        return X * (1 - X) * Y * (1 - Y) * Z * (1 - Z)

    def f(X, Y, Z):
        return 2 * (
            Y * (1 - Y) * Z * (1 - Z)
            + X * (1 - X) * Z * (1 - Z)
            + X * (1 - X) * Y * (1 - Y)
        )

    return from_callables3("poisson3d_polynomial", grid, u_exact=u, f=f)


def helmholtz3d_mms(n: int, k: float = 2.0) -> Problem3D:
    """-(lap u) - k^2 u = f with u = sin(pi x) sin(pi y) sin(pi z)."""
    grid = Grid3D(n, n, n)
    return from_callables3(
        f"helmholtz3d_k{k}", grid,
        u_exact=lambda X, Y, Z: np.sin(PI * X) * np.sin(PI * Y) * np.sin(PI * Z),
        f=lambda X, Y, Z: (3 * PI**2 - k**2)
        * np.sin(PI * X) * np.sin(PI * Y) * np.sin(PI * Z),
        lam=-float(k) ** 2,
    )


def varcoef3d_mms(n: int) -> Problem3D:
    """-div(a grad u) = f with a = 1 + x + y + z, u = sin sin sin:
    f = a * 3 pi^2 u - grad a . grad u, grad a = (1,1,1)."""
    grid = Grid3D(n, n, n)

    def f(X, Y, Z):
        a = 1.0 + X + Y + Z
        sx, cx = np.sin(PI * X), np.cos(PI * X)
        sy, cy = np.sin(PI * Y), np.cos(PI * Y)
        sz, cz = np.sin(PI * Z), np.cos(PI * Z)
        grad_dot = PI * (cx * sy * sz + sx * cy * sz + sx * sy * cz)
        return a * 3 * PI**2 * sx * sy * sz - grad_dot

    return from_callables3(
        "varcoef3d", grid,
        u_exact=lambda X, Y, Z: np.sin(PI * X) * np.sin(PI * Y) * np.sin(PI * Z),
        f=f,
        a=lambda X, Y, Z: 1.0 + X + Y + Z,
    )


def jump_coefficient3d(n: int, ratio: float = 1e3) -> Problem3D:
    """Piecewise-constant coefficient with a ratio:1 jump at x = 0.5
    (3D analogue of models/problems.jump_coefficient_problem). No exact
    solution; f = 1, used for convergence-factor tests."""
    grid = Grid3D(n, n, n)

    def a(X, Y, Z):
        return np.where(X < 0.5, 1.0, ratio)

    return from_callables3(
        f"jumpcoef3d_{ratio:g}", grid,
        f=lambda X, Y, Z: 1.0 + 0.0 * X,
        a=a,
    )


CATALOGUE3D = {
    "trigonometric": poisson3d_mms_sinsinsin,
    "polynomial": poisson3d_mms_polynomial,
    "helmholtz": helmholtz3d_mms,
    "variable_coefficient": varcoef3d_mms,
    "jump_coefficient": jump_coefficient3d,
}


def neumann3d_test(n: int) -> Problem3D:
    """Mixed Dirichlet/Neumann box: u = sin(pi x) sin(pi y) cos(pi z) has
    du/dz = 0 at z = 0 and z = 1, so bottom/top are homogeneous Neumann and
    the four lateral faces carry Dirichlet data from the exact solution.
    Order-2 MMS for the 3D ghost elimination (the reference had no 3D BCs
    at all, reference applications/poisson_solver.py:483-557)."""
    from ..core.bc3d import mixed3d

    grid = Grid3D(n, n, n)
    spec = mixed3d(bottom="neumann", top="neumann")
    return from_callables3(
        "neumann3d_test", grid,
        u_exact=lambda X, Y, Z: np.sin(PI * X) * np.sin(PI * Y) * np.cos(PI * Z),
        f=lambda X, Y, Z: 3 * PI**2 * np.sin(PI * X) * np.sin(PI * Y)
        * np.cos(PI * Z),
        spec=spec,
        bc_values={"bottom": 0.0, "top": 0.0},
    )


def periodic3d_helmholtz(n: int) -> Problem3D:
    """Fully-periodic box, definite Helmholtz (-lap + 1):
    u = sin(2 pi x) sin(2 pi y) sin(2 pi z), f = (12 pi^2 + 1) u."""
    from ..core.bc import BCSide
    from ..core.bc3d import BoundarySpec3D as BS3

    side = BCSide(kind=BCKind.PERIODIC)
    spec = BS3(*(side,) * 6)
    grid = Grid3D(n, n, n)
    return from_callables3(
        "periodic3d_helmholtz", grid,
        u_exact=lambda X, Y, Z: np.sin(2 * PI * X) * np.sin(2 * PI * Y)
        * np.sin(2 * PI * Z),
        f=lambda X, Y, Z: (12 * PI**2 + 1.0) * np.sin(2 * PI * X)
        * np.sin(2 * PI * Y) * np.sin(2 * PI * Z),
        lam=1.0,
        spec=spec,
    )


def anisotropic3d_z(n: int, aspect: float = 0.1) -> Problem3D:
    """z-stretched box (hz = aspect * hx): point smoothers stall on the
    strong z coupling; the zebra line-z smoother restores textbook rates
    (solvers/multigrid3d.smooth3d 'line_z')."""
    grid = Grid3D(n, n, n, domain=(0, 1, 0, 1, 0, aspect))
    kz = 1.0 / aspect

    def u(X, Y, Z):
        return np.sin(PI * X) * np.sin(PI * Y) * np.sin(PI * kz * Z)

    def f(X, Y, Z):
        return (2 + kz**2) * PI**2 * u(X, Y, Z)

    return from_callables3(f"anisotropic3d_z{aspect:g}", grid, u_exact=u, f=f)
