"""Heat-equation MMS test problems.

Covers the reference's ``HeatTestProblems`` catalogue (reference
applications/test_problems.py:312-613) and the time-dependent MMS problems of
``MMSValidator`` (reference validation/mms_validation.py:219-277). Exact
solutions and sources are hand-derived (documented per problem) and written in
jnp ops so they trace into the scan body.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import bc as bc_mod
from ..core.grid import Grid
from .heat import HeatProblem, heat_problem_from_callables

PI = np.pi


def pure_diffusion(n: int, alpha: float = 1.0) -> HeatProblem:
    """u = sin(pi x) sin(pi y) exp(-2 pi^2 alpha t); q = 0.
    (reference test_problems.py 'pure_diffusion')."""

    def exact(X, Y, t):
        return jnp.sin(PI * X) * jnp.sin(PI * Y) * jnp.exp(-2 * PI**2 * alpha * t)

    return heat_problem_from_callables(
        "heat_pure_diffusion", Grid(n, n), alpha=alpha, exact=exact
    )


def heat_source(n: int, alpha: float = 1.0) -> HeatProblem:
    """Steady-in-time manufactured state u = sin(pi x) sin(pi y) (u_t = 0):
    q = -alpha lap u = 2 pi^2 alpha u (reference test_problems.py
    'heat_source' semantics: source balancing diffusion)."""

    def exact(X, Y, t):
        return jnp.sin(PI * X) * jnp.sin(PI * Y) + 0.0 * t

    def q(X, Y, t):
        return 2 * PI**2 * alpha * jnp.sin(PI * X) * jnp.sin(PI * Y) + 0.0 * t

    return heat_problem_from_callables(
        "heat_source", Grid(n, n), alpha=alpha, exact=exact, q=q
    )


def exponential_decay(n: int, alpha: float = 1.0, rate: float = 1.0) -> HeatProblem:
    """u = sin(pi x) sin(pi y) e^{-rate t} with compensating source:
    q = u_t - alpha lap u = (-rate + 2 pi^2 alpha) u
    (reference mms_validation.py 'heat_exponential')."""

    k = -rate + 2 * PI**2 * alpha

    def exact(X, Y, t):
        return jnp.sin(PI * X) * jnp.sin(PI * Y) * jnp.exp(-rate * t)

    def q(X, Y, t):
        return k * jnp.sin(PI * X) * jnp.sin(PI * Y) * jnp.exp(-rate * t)

    return heat_problem_from_callables(
        "heat_exponential", Grid(n, n), alpha=alpha, exact=exact, q=q
    )


def polynomial_time(n: int, alpha: float = 1.0) -> HeatProblem:
    """u = (1 + t + t^2) x(1-x) y(1-y):
    q = u_t - alpha lap u = (1+2t) xy' + 2 alpha (1+t+t^2)(x(1-x)+y(1-y))
    (reference mms_validation.py 'heat_polynomial_time',
    test_problems.py 'polynomial_time')."""

    def s(X, Y):
        return X * (1 - X) * Y * (1 - Y)

    def exact(X, Y, t):
        return (1 + t + t * t) * s(X, Y)

    def q(X, Y, t):
        return (1 + 2 * t) * s(X, Y) + 2 * alpha * (1 + t + t * t) * (
            X * (1 - X) + Y * (1 - Y)
        )

    return heat_problem_from_callables(
        "heat_polynomial_time", Grid(n, n), alpha=alpha, exact=exact, q=q
    )


def oscillating(n: int, alpha: float = 1.0, omega: float = 2 * PI) -> HeatProblem:
    """u = sin(pi x) sin(pi y) cos(omega t):
    q = u_t - alpha lap u = (-omega sin(omega t) + 2 pi^2 alpha cos(omega t)) S
    (reference mms_validation.py 'heat_oscillating')."""

    def exact(X, Y, t):
        return jnp.sin(PI * X) * jnp.sin(PI * Y) * jnp.cos(omega * t)

    def q(X, Y, t):
        S = jnp.sin(PI * X) * jnp.sin(PI * Y)
        return S * (-omega * jnp.sin(omega * t) + 2 * PI**2 * alpha * jnp.cos(omega * t))

    return heat_problem_from_callables(
        "heat_oscillating", Grid(n, n), alpha=alpha, exact=exact, q=q
    )


def spatially_exact_oscillating(n: int, alpha: float = 1.0,
                                omega: float = 2 * PI) -> HeatProblem:
    """u = (x^2 + y^2) cos(omega t): quadratic in space, so the 5-point
    stencil has ZERO spatial error — the measured error is purely temporal.
    q = u_t - alpha lap u = -(x^2+y^2) omega sin(omega t) - 4 alpha cos(omega t).
    Built for clean dt-order measurements (CN/BDF2 second order)."""

    def exact(X, Y, t):
        return (X**2 + Y**2) * jnp.cos(omega * t)

    def q(X, Y, t):
        return (-(X**2 + Y**2) * omega * jnp.sin(omega * t)
                - 4 * alpha * jnp.cos(omega * t))

    return heat_problem_from_callables(
        "heat_spatially_exact_osc", Grid(n, n), alpha=alpha, exact=exact, q=q
    )


def gaussian_diffusion(n: int, alpha: float = 1.0, t0: float = 0.01) -> HeatProblem:
    """Free-space Gaussian, valid while mass stays far from the boundary:
    u = 1/(4 pi alpha (t+t0)) exp(-r^2/(4 alpha (t+t0))), q = 0
    (reference test_problems.py 'gaussian_diffusion'). Dirichlet ring tracks
    the exact (tiny) boundary values."""

    def exact(X, Y, t):
        tau = 4 * alpha * (t + t0)
        r2 = (X - 0.5) ** 2 + (Y - 0.5) ** 2
        return jnp.exp(-r2 / tau) / (PI * tau)

    return heat_problem_from_callables(
        "heat_gaussian", Grid(n, n), alpha=alpha, exact=exact
    )


def multiple_frequencies(n: int, alpha: float = 1.0) -> HeatProblem:
    """u = sum_k sin(k pi x) sin(k pi y) e^{-2 k^2 pi^2 alpha t}, k in {1,2,3};
    q = 0 — each mode decays at its own rate
    (reference test_problems.py 'multiple_frequencies')."""

    def exact(X, Y, t):
        u = 0.0
        for k in (1, 2, 3):
            u = u + jnp.sin(k * PI * X) * jnp.sin(k * PI * Y) * jnp.exp(
                -2 * k * k * PI**2 * alpha * t
            )
        return u

    return heat_problem_from_callables(
        "heat_multifreq", Grid(n, n), alpha=alpha, exact=exact
    )


def traveling_wave(n: int, alpha: float = 1.0, c: float = 1.0) -> HeatProblem:
    """u = exp(-(x - c t)) advection-like profile: q = u_t - alpha lap u =
    (c - alpha) * (-u)' ... hand-derived: u_x = -u, u_xx = u, u_t = c u, so
    q = (c - alpha) u (reference test_problems.py 'traveling_wave')."""

    def exact(X, Y, t):
        return jnp.exp(-(X - c * t)) + 0.0 * Y

    def q(X, Y, t):
        return (c - alpha) * exact(X, Y, t)

    return heat_problem_from_callables(
        "heat_traveling_wave", Grid(n, n), alpha=alpha, exact=exact, q=q
    )


def time_dependent_bc(n: int, alpha: float = 1.0) -> HeatProblem:
    """u = (x^2 + y^2) (1 + t): time-dependent inhomogeneous Dirichlet data;
    q = u_t - alpha lap u = (x^2+y^2) - 4 alpha (1+t)
    (reference test_problems.py 'time_dependent_bc')."""

    def exact(X, Y, t):
        return (X**2 + Y**2) * (1 + t)

    def q(X, Y, t):
        return (X**2 + Y**2) - 4 * alpha * (1 + t)

    return heat_problem_from_callables(
        "heat_time_dependent_bc", Grid(n, n), alpha=alpha, exact=exact, q=q
    )


def separable(n: int, alpha: float = 1.0) -> HeatProblem:
    """u = e^{-alpha pi^2 t} sin(pi x) * e^{-alpha pi^2 t} sin(pi y) — i.e.
    the pure-diffusion mode written as a separable product; q = 0
    (reference test_problems.py 'separable')."""
    return pure_diffusion(n, alpha)


def neumann_heat(n: int, alpha: float = 1.0) -> HeatProblem:
    """u = cos(pi x) cos(pi y) e^{-2 pi^2 alpha t}: du/dn = 0 on all sides —
    pure-Neumann compatible mode; q = 0. Exercises Neumann BCs in time
    stepping (the implicit operator A_sp + lam is nonsingular for lam > 0,
    so pure Neumann is well-posed per step)."""

    def exact(X, Y, t):
        return jnp.cos(PI * X) * jnp.cos(PI * Y) * jnp.exp(-2 * PI**2 * alpha * t)

    spec = bc_mod.neumann()
    prob = heat_problem_from_callables(
        "heat_neumann", Grid(n, n), alpha=alpha, spec=spec, exact=exact
    )
    return prob


CATALOGUE = {
    "spatially_exact_oscillating": spatially_exact_oscillating,
    "pure_diffusion": pure_diffusion,
    "heat_source": heat_source,
    "exponential_decay": exponential_decay,
    "polynomial_time": polynomial_time,
    "oscillating": oscillating,
    "gaussian_diffusion": gaussian_diffusion,
    "multiple_frequencies": multiple_frequencies,
    "traveling_wave": traveling_wave,
    "time_dependent_bc": time_dependent_bc,
    "separable": separable,
    "neumann_heat": neumann_heat,
}
