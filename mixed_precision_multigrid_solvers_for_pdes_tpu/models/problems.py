"""Problem definitions and manufactured-solution (MMS) test problems.

Covers the reference's ``PoissonTestProblems`` catalogue (reference
applications/test_problems.py:27-295) and the steady MMS problems of
``MMSValidator`` (reference validation/mms_validation.py:77-277), but with
hand-derived exact/f pairs instead of sympy (symbolic work at setup is host
code anyway; the derivations are one-liners documented per problem).

A ``Problem`` carries padded field arrays + the static grid/BC spec, and knows
how to build its hierarchy and initial guess. Unlike the reference, Helmholtz
and variable-coefficient problems are solved *for real* (the reference only
simulated them, reference benchmarks/validation_suite.py:256-300).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core import bc as bc_mod
from ..core.bc import BCKind, BoundarySpec
from ..core.grid import Grid
from ..ops import norms
from ..ops import stencil as st_mod


def eval_padded(grid: Grid, fn: Callable, dtype=np.float64) -> np.ndarray:
    """Evaluate fn(X, Y) on the padded mesh, zeroing padding cells."""
    X, Y = grid.coordinates(padded=True)
    vals = np.asarray(fn(X, Y), dtype=dtype)
    vals = np.broadcast_to(vals, X.shape).copy()
    vals[grid.nx :, :] = 0.0
    vals[:, grid.ny :] = 0.0
    return vals


@dataclasses.dataclass
class Problem:
    """A discretized scalar elliptic problem A u = f with BC data.

    Counterpart of reference applications/poisson_solver.py:25 (PoissonProblem)
    plus the coefficient/shift generality of SURVEY section 7 decision 2.
    """

    name: str
    grid: Grid
    spec: BoundarySpec = BoundarySpec()
    f: Any = None                      # padded RHS (excl. BC corrections)
    a: Any = None                      # padded coefficient field or None
    lam: Any = 0.0                     # scalar or padded array
    dirichlet_values: Any = None       # padded array with g on Dirichlet rings
    bc_values: Optional[Dict[str, Any]] = None  # Neumann/Robin g per side
    exact: Any = None                  # padded exact solution (MMS) or None
    domain: Any = None                 # DomainSpec for irregular domains
    expected_order: float = 2.0        # MMS convergence order (reduced for
                                       # singular problems)

    def rhs(self, dtype=jnp.float32):
        """Full RHS including Neumann/Robin ghost-elimination corrections."""
        f = jnp.asarray(self.f, dtype)
        if self.bc_values:
            f = f + st_mod.bc_rhs_correction(self.grid, self.spec,
                                             self.bc_values, dtype)
        return f

    def initial_guess(self, dtype=jnp.float32):
        """Zero interior with Dirichlet values installed on every fixed node
        (boundary ring + irregular-domain cut nodes)."""
        u0 = jnp.zeros(self.grid.shape_padded, dtype)
        if self.dirichlet_values is not None and not _no_dirichlet(self.spec):
            g = self.grid
            unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                          self.spec)
            if self.domain is not None:
                unknown = unknown & self.domain.interior_mask(g)
            fixed = bc_mod.logical_mask(g.nx, g.ny, g.shape_padded) & ~unknown
            u0 = jnp.where(fixed, jnp.asarray(self.dirichlet_values, dtype), u0)
        return u0

    def error_norms(self, u) -> Dict[str, float]:
        """L2 (grid-scaled), Linf, and H1-seminorm error vs the exact
        solution (reference poisson_solver.py:281-313). For irregular
        domains the error counts open-domain nodes only."""
        if self.exact is None:
            raise ValueError(f"problem {self.name!r} has no exact solution")
        g = self.grid
        mask = bc_mod.logical_mask(g.nx, g.ny, g.shape_padded)
        if self.domain is not None:
            mask = mask & self.domain.interior_mask(g)
        diff = jnp.where(mask, u.astype(jnp.float64) - jnp.asarray(self.exact), 0.0)
        return {
            "l2": float(norms.scaled_l2(diff, g.hx, g.hy)),
            "linf": float(jnp.max(jnp.abs(diff))),
            "h1": float(norms.h1_seminorm(diff, mask, g.hx, g.hy)),
        }


def _no_dirichlet(spec: BoundarySpec) -> bool:
    return all(BCKind.DIRICHLET not in spec.side(s).kinds
               for s in bc_mod.SIDES)


def from_callables(
    name: str,
    grid: Grid,
    *,
    u_exact: Optional[Callable] = None,
    f: Callable,
    spec: BoundarySpec = BoundarySpec(),
    a: Optional[Callable] = None,
    lam: Any = 0.0,
    bc_values: Optional[Dict[str, Any]] = None,
) -> Problem:
    """Assemble a Problem from host callables of (X, Y)."""
    exact = eval_padded(grid, u_exact) if u_exact is not None else None
    return Problem(
        name=name,
        grid=grid,
        spec=spec,
        f=eval_padded(grid, f),
        a=eval_padded(grid, a) if a is not None else None,
        lam=lam,
        dirichlet_values=exact if exact is not None else None,
        bc_values=bc_values,
        exact=exact,
    )


# --------------------------------------------------------------------------
# MMS catalogue (reference test_problems.py:27-295, mms_validation.py:77-277)
# --------------------------------------------------------------------------

def poisson_mms_sinsin(n: int, domain=(0.0, 1.0, 0.0, 1.0)) -> Problem:
    """u = sin(pi x) sin(pi y), f = 2 pi^2 u. Homogeneous Dirichlet.

    The reference's primary validation problem (reference
    corrected_multigrid.py:399-429 'trig')."""
    grid = Grid(n, n, domain)
    pi = np.pi
    return from_callables(
        "poisson_sinsin", grid,
        u_exact=lambda X, Y: np.sin(pi * X) * np.sin(pi * Y),
        f=lambda X, Y: 2 * pi**2 * np.sin(pi * X) * np.sin(pi * Y),
    )


def poisson_mms_polynomial(n: int) -> Problem:
    """u = x(1-x)y(1-y), f = 2[x(1-x) + y(1-y)]
    (reference test_problems.py 'polynomial')."""
    grid = Grid(n, n)
    return from_callables(
        "poisson_polynomial", grid,
        u_exact=lambda X, Y: X * (1 - X) * Y * (1 - Y),
        f=lambda X, Y: 2 * (X * (1 - X) + Y * (1 - Y)),
    )


def poisson_mms_high_frequency(n: int, k: int = 4) -> Problem:
    """u = sin(k pi x) sin(k pi y) (reference test_problems.py 'high_frequency')."""
    grid = Grid(n, n)
    pi = np.pi
    return from_callables(
        f"poisson_highfreq_k{k}", grid,
        u_exact=lambda X, Y: np.sin(k * pi * X) * np.sin(k * pi * Y),
        f=lambda X, Y: 2 * (k * pi) ** 2 * np.sin(k * pi * X) * np.sin(k * pi * Y),
    )


def poisson_mms_inhomogeneous(n: int) -> Problem:
    """u = x^2 + y^2 (inhomogeneous Dirichlet), f = -4
    (reference test_problems.py 'mixed')."""
    grid = Grid(n, n)
    return from_callables(
        "poisson_inhomogeneous", grid,
        u_exact=lambda X, Y: X**2 + Y**2,
        f=lambda X, Y: -4.0 + 0.0 * X,
    )


def poisson_mms_exponential(n: int) -> Problem:
    """u = exp(x+y) sin(pi x) sin(pi y); f = -lap(u) hand-derived.

    lap(u) = e^{x+y}[2 sin sin + 2 pi (cos sin + sin cos) - 2 pi^2 sin sin].
    (reference test_problems.py 'exponential')."""
    grid = Grid(n, n)
    pi = np.pi

    def u(X, Y):
        return np.exp(X + Y) * np.sin(pi * X) * np.sin(pi * Y)

    def f(X, Y):
        E = np.exp(X + Y)
        sx, cx = np.sin(pi * X), np.cos(pi * X)
        sy, cy = np.sin(pi * Y), np.cos(pi * Y)
        lap = E * (2 * sx * sy + 2 * pi * (cx * sy + sx * cy) - 2 * pi**2 * sx * sy)
        return -lap

    return from_callables("poisson_exponential", grid, u_exact=u, f=f)


def poisson_mms_anisotropic(n: int, ax: float = 1.0, ay: float = 0.01) -> Problem:
    """Anisotropic domain scaling via unequal spacings: solved on [0,1]x[0,1]
    with u = sin(pi x) sin(pi y) against -(ax u_xx + ay u_yy) = f.

    Modeled with the variable-coefficient machinery would need a tensor a;
    instead we rescale the y-domain so hy/hx = sqrt(ay/ax), the standard
    equivalent test (reference test_problems.py 'anisotropic' uses coefficient
    form; both probe smoother robustness to anisotropy)."""
    aspect = float(np.sqrt(ay / ax))
    grid = Grid(n, n, (0.0, 1.0, 0.0, aspect))
    pi = np.pi
    ky = pi / aspect
    return from_callables(
        "poisson_anisotropic", grid,
        u_exact=lambda X, Y: np.sin(pi * X) * np.sin(ky * Y),
        f=lambda X, Y: (pi**2 + ky**2) * np.sin(pi * X) * np.sin(ky * Y),
    )


def neumann_test_problem(n: int) -> Problem:
    """u = x^2 + y^2, f = -4; Neumann (du/dn = g from exact) on east, Dirichlet
    elsewhere (reference test_problems.py 'neumann_test' semantics)."""
    grid = Grid(n, n)
    spec = bc_mod.mixed(east="neumann")
    # east outward normal = +x: g = du/dx = 2x = 2 at x=1
    prob = from_callables(
        "poisson_neumann_east", grid,
        u_exact=lambda X, Y: X**2 + Y**2,
        f=lambda X, Y: -4.0 + 0.0 * X,
        spec=spec,
        bc_values={"east": 2.0},
    )
    return prob


def helmholtz_mms(n: int, k: float = 2.0) -> Problem:
    """-(lap u) - k^2 u = f with u = sin(pi x) sin(pi y):
    f = (2 pi^2 - k^2) u. Real Helmholtz — the reference only simulated this
    (reference benchmarks/validation_suite.py:256-300). Definite as long as
    k^2 < 2 pi^2."""
    grid = Grid(n, n)
    pi = np.pi
    prob = from_callables(
        f"helmholtz_k{k}", grid,
        u_exact=lambda X, Y: np.sin(pi * X) * np.sin(pi * Y),
        f=lambda X, Y: (2 * pi**2 - k**2) * np.sin(pi * X) * np.sin(pi * Y),
        lam=-float(k) ** 2,
    )
    return prob


def robin_test_problem(n: int, alpha: float = 1.0, beta: float = 1.0) -> Problem:
    """u = x^2 + y^2, f = -4; Robin (alpha*u + beta*du/dn = g) on east,
    Dirichlet elsewhere. g = alpha*(1 + y^2) + 2*beta at x = 1
    (reference boundary_conditions/advanced_bc.py:139-180 Robin semantics)."""
    grid = Grid(n, n)
    spec = BoundarySpec(east=bc_mod.BCSide(kind=BCKind.ROBIN,
                                           alpha=alpha, beta=beta))
    _, Yp = grid.coordinates(padded=True)
    g_east = alpha * (1.0 + Yp**2) + 2.0 * beta
    return from_callables(
        "poisson_robin_east", grid,
        u_exact=lambda X, Y: X**2 + Y**2,
        f=lambda X, Y: -4.0 + 0.0 * X,
        spec=spec,
        bc_values={"east": g_east},
    )


def mixed_segment_problem(n: int) -> Problem:
    """Per-segment mixed BCs (reference
    boundary_conditions/advanced_bc.py:219-334 MixedBoundaryCondition):
    u = x^2 + y^2, f = -4, with the EAST side split Dirichlet on
    y in [0, 0.5) / Robin (u + du/dn = g) on y in [0.5, 1], and the NORTH
    side carrying a Neumann segment on x in [0, 0.5] (du/dn = du/dy = 2 at
    y = 1) with a Dirichlet remainder. Quadratic u makes every ghost
    elimination exact, so the discrete solution matches u to rounding."""
    grid = Grid(n, n)
    spec = BoundarySpec(
        east=bc_mod.BCSide(
            kind=BCKind.DIRICHLET,
            segments=(bc_mod.BCSegment(0.5, 1.0, kind=BCKind.ROBIN,
                                       alpha=1.0, beta=1.0),),
        ),
        north=bc_mod.BCSide(
            kind=BCKind.DIRICHLET,
            segments=(bc_mod.BCSegment(0.0, 0.5, kind=BCKind.NEUMANN),),
        ),
    )
    _, Yp = grid.coordinates(padded=True)
    # east Robin: g = u + du/dx = (1 + y^2) + 2 on the segment
    g_east = (1.0 + Yp**2) + 2.0
    return from_callables(
        "poisson_mixed_segments", grid,
        u_exact=lambda X, Y: X**2 + Y**2,
        f=lambda X, Y: -4.0 + 0.0 * X,
        spec=spec,
        bc_values={"east": g_east, "north": 2.0},
    )


def mixed_segment_mms(n: int) -> Problem:
    """O(h^2) order-study companion of mixed_segment_problem with a
    non-polynomial solution: u = exp(x + y), f = -2 exp(x + y); the WEST
    side is Neumann on y in [0.25, 0.75] (du/dn = -du/dx = -exp(y) at
    x = 0) and Dirichlet elsewhere. The manufactured g satisfies both
    conditions at the junctions, so no corner singularity is introduced and
    second order holds."""
    grid = Grid(n, n)
    spec = BoundarySpec(
        west=bc_mod.BCSide(
            kind=BCKind.DIRICHLET,
            segments=(bc_mod.BCSegment(0.25, 0.75, kind=BCKind.NEUMANN),),
        ),
    )
    Xp, Yp = grid.coordinates(padded=True)
    g_west = -np.exp(Xp + Yp)  # evaluated on the i = 0 ring where X = 0
    return from_callables(
        "poisson_mixed_segment_mms", grid,
        u_exact=lambda X, Y: np.exp(X + Y),
        f=lambda X, Y: -2.0 * np.exp(X + Y),
        spec=spec,
        bc_values={"west": g_west},
    )


def periodic_helmholtz_mms(n: int) -> Problem:
    """Shifted Helmholtz -(lap u) + u = f, fully periodic on [0,1]^2:
    u = sin(2 pi x) cos(2 pi y), f = (8 pi^2 + 1) u. The +1 shift makes the
    periodic operator nonsingular (pure periodic Poisson has the constant
    nullspace). Exercises the wrap-ghost machinery end to end — the
    reference's periodic support never reached its solvers
    (reference boundary_conditions/advanced_bc.py:182-217)."""
    grid = Grid(n, n)
    pi = np.pi
    spec = BoundarySpec(
        west=bc_mod.BCSide(kind=BCKind.PERIODIC),
        east=bc_mod.BCSide(kind=BCKind.PERIODIC),
        south=bc_mod.BCSide(kind=BCKind.PERIODIC),
        north=bc_mod.BCSide(kind=BCKind.PERIODIC),
    )
    return from_callables(
        "periodic_helmholtz", grid,
        u_exact=lambda X, Y: np.sin(2 * pi * X) * np.cos(2 * pi * Y),
        f=lambda X, Y: (8 * pi**2 + 1) * np.sin(2 * pi * X) * np.cos(2 * pi * Y),
        spec=spec,
        lam=1.0,
    )


def variable_coefficient_mms(n: int) -> Problem:
    """-div(a grad u) = f with a = 1 + x + y (smooth, positive) and
    u = sin(pi x) sin(pi y).

    f = a * 2 pi^2 sin sin - pi (cos sin + sin cos) since grad a = (1, 1):
    -div(a grad u) = -a lap u - grad a . grad u."""
    grid = Grid(n, n)
    pi = np.pi

    def f(X, Y):
        a = 1.0 + X + Y
        sx, cx = np.sin(pi * X), np.cos(pi * X)
        sy, cy = np.sin(pi * Y), np.cos(pi * Y)
        return a * 2 * pi**2 * sx * sy - pi * (cx * sy + sx * cy)

    return from_callables(
        "varcoef_linear", grid,
        u_exact=lambda X, Y: np.sin(pi * X) * np.sin(pi * Y),
        f=f,
        a=lambda X, Y: 1.0 + X + Y,
    )


def jump_coefficient_problem(n: int, ratio: float = 1e3) -> Problem:
    """Piecewise-constant coefficient with a ratio:1 jump at x = 0.5
    (reference docs/results.md jump-coefficient robustness row). No closed-form
    exact solution; used for convergence-factor tests with f = 1."""
    grid = Grid(n, n)

    def a(X, Y):
        return np.where(X < 0.5, 1.0, ratio)

    return from_callables(
        f"jumpcoef_{ratio:g}", grid,
        f=lambda X, Y: 1.0 + 0.0 * X,
        a=a,
    )


def boundary_layer_problem(n: int, eps: float = 0.05) -> Problem:
    """Exponential boundary layer of width eps at x = 0
    (reference test_problems.py boundary_layer, eps = 0.05).

    u = g(x) sin(pi y) with g(x) = (1 - e^{-x/eps}) - x (1 - e^{-1/eps})
    (g(0) = g(1) = 0, so homogeneous Dirichlet); the manufactured source is
    f = -lap u = (pi^2 g - g'') sin(pi y), g'' = -(1/eps^2) e^{-x/eps}.
    Second order holds once h resolves the layer (h < eps); on coarser grids
    the constant is large but the ladder order is still ~2.
    """
    grid = Grid(n, n)
    PI = np.pi
    c1 = 1.0 - np.exp(-1.0 / eps)

    def g(X):
        return (1.0 - np.exp(-X / eps)) - X * c1

    def u(X, Y):
        return g(X) * np.sin(PI * Y)

    def f(X, Y):
        gpp = -(1.0 / eps**2) * np.exp(-X / eps)
        return (PI**2 * g(X) - gpp) * np.sin(PI * Y)

    return from_callables(f"boundary_layer_eps{eps:g}", grid, u_exact=u, f=f)


def _corner_uexact(xc: float, yc: float, clockwise: bool):
    """r^(2/3) sin(2 theta / 3) around (xc, yc)."""

    def u(X, Y):
        dx = X - xc
        dy = Y - yc
        r = np.sqrt(dx * dx + dy * dy)
        if clockwise:  # re-entrant corner: theta in [0, 3 pi/2], cw from +x
            phi = np.arctan2(-dy, dx)
            theta = np.where(phi >= 0.0, phi, phi + 2.0 * np.pi)
        else:          # convex corner at the origin: theta in [0, pi/2]
            theta = np.arctan2(dy, dx)
        return r ** (2.0 / 3.0) * np.sin(2.0 * theta / 3.0)

    return u


def corner_singularity_problem(n: int) -> Problem:
    """Harmonic u = r^(2/3) sin(2 theta/3) around the (0,0) corner of the
    unit square (reference test_problems.py corner_singularity).

    f = 0; inhomogeneous Dirichlet data from the exact solution. The
    derivative singularity at the corner limits the observed L2 order below
    2 (the solution is only in H^(1+2/3)); the MMS ladder documents the
    reduced order instead of asserting 2.0.
    """
    grid = Grid(n, n)
    prob = from_callables(
        "corner_singularity", grid,
        u_exact=_corner_uexact(0.0, 0.0, clockwise=False),
        f=lambda X, Y: 0.0 * X,
    )
    return dataclasses.replace(prob, expected_order=4.0 / 3.0)


def l_shaped_problem(n: int) -> Problem:
    """The classic L-shaped-domain benchmark: unit square minus the
    [1/2, 1]^2 quadrant, u = r^(2/3) sin(2 theta/3) around the re-entrant
    corner (reference test_problems.py l_shaped).

    theta is measured clockwise from the cut edge {y = 1/2, x > 1/2} so that
    u vanishes on both cut edges (theta = 0 and 3 pi/2); f = 0 and the outer
    Dirichlet data comes from the exact solution. Expected L2 order ~4/3
    (H^(1+2/3) regularity at the 3 pi/2 corner).
    """
    from ..core.domain import LShapedDomain

    grid = Grid(n, n)
    domain = LShapedDomain(0.5, 0.5)
    u_fn = _corner_uexact(0.5, 0.5, clockwise=True)

    def u_masked(X, Y):
        vals = u_fn(X, Y)
        # zero strictly inside the removed quadrant (never read; keeps the
        # stored 'exact' clean there for error masking)
        removed_open = (X > 0.5 + 1e-12) & (Y > 0.5 + 1e-12)
        return np.where(removed_open, 0.0, vals)

    prob = from_callables(
        "l_shaped", grid, u_exact=u_masked, f=lambda X, Y: 0.0 * X,
    )
    return dataclasses.replace(prob, domain=domain, expected_order=4.0 / 3.0)


CATALOGUE = {
    "trigonometric": poisson_mms_sinsin,
    "polynomial": poisson_mms_polynomial,
    "high_frequency": poisson_mms_high_frequency,
    "mixed": poisson_mms_inhomogeneous,
    "exponential": poisson_mms_exponential,
    "anisotropic": poisson_mms_anisotropic,
    "neumann_test": neumann_test_problem,
    "helmholtz": helmholtz_mms,
    "variable_coefficient": variable_coefficient_mms,
    "jump_coefficient": jump_coefficient_problem,
    "periodic_helmholtz": periodic_helmholtz_mms,
    "robin_test": robin_test_problem,
    "mixed_segments": mixed_segment_problem,
    "mixed_segments_mms": mixed_segment_mms,
    "boundary_layer": boundary_layer_problem,
    "corner_singularity": corner_singularity_problem,
    "l_shaped": l_shaped_problem,
}
