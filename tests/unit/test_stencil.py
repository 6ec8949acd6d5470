"""Operator tests with exact answers (reference tests/unit/test_operators.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mixed_precision_multigrid_solvers_for_pdes_tpu.core import bc as bc_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import stencil as st_mod


def _interior(arr, g):
    return np.asarray(arr)[1 : g.nx - 1, 1 : g.ny - 1]


def test_laplacian_constant_field():
    g = Grid(17, 17)
    st = st_mod.make_stencil(g, dtype=jnp.float64)
    u = jnp.asarray(g.pad_field(np.ones((17, 17))))
    Au = st_mod.apply(st, u)
    np.testing.assert_allclose(_interior(Au, g), 0.0, atol=1e-12)


def test_laplacian_linear_field():
    g = Grid(17, 33)
    X, Y = g.coordinates()
    st = st_mod.make_stencil(g, dtype=jnp.float64)
    u = jnp.asarray(g.pad_field(2 * X + 3 * Y))
    np.testing.assert_allclose(_interior(st_mod.apply(st, u), g), 0.0, atol=1e-9)


def test_laplacian_quadratic_exact():
    # -lap(x^2 + y^2) = -4 exactly for the 5-point stencil
    g = Grid(17, 17)
    X, Y = g.coordinates()
    st = st_mod.make_stencil(g, dtype=jnp.float64)
    u = jnp.asarray(g.pad_field(X**2 + Y**2))
    np.testing.assert_allclose(_interior(st_mod.apply(st, u), g), -4.0, rtol=1e-10)


def test_helmholtz_shift():
    g = Grid(17, 17)
    X, Y = g.coordinates()
    lam = 7.0
    st = st_mod.make_stencil(g, lam=lam, dtype=jnp.float64)
    u = jnp.asarray(g.pad_field(X**2 + Y**2))
    expected = -4.0 + lam * (X**2 + Y**2)[1:-1, 1:-1]
    np.testing.assert_allclose(_interior(st_mod.apply(st, u), g), expected, rtol=1e-10)


def test_variable_coefficient_consistency():
    # -div(a grad u) with a = 1+x+y, u = x^2+y^2:
    # = -a*4 - (du/dx + du/dy) = -4a - 2x - 2y ; discretization is O(h^2)
    g = Grid(65, 65)
    X, Y = g.coordinates()
    a = g.pad_field(1.0 + X + Y)
    st = st_mod.make_stencil(g, a=jnp.asarray(a), dtype=jnp.float64)
    u = jnp.asarray(g.pad_field(X**2 + Y**2))
    exact = (-4.0 * (1 + X + Y) - 2 * X - 2 * Y)[1:-1, 1:-1]
    got = _interior(st_mod.apply(st, u), g)
    assert np.max(np.abs(got - exact)) < 50 * g.hx**2


def test_diagonal_identity():
    # c = w+e+s+n+lam by construction
    g = Grid(17, 17)
    st = st_mod.make_stencil(g, lam=3.0, dtype=jnp.float64)
    assert float(st.c) == pytest.approx(float(st.w + st.e + st.s + st.n) + 3.0)


def test_residual_masked():
    g = Grid(17, 17)
    st = st_mod.make_stencil(g, dtype=jnp.float64)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded, bc_mod.dirichlet())
    u = jnp.zeros(g.shape_padded, jnp.float64)
    f = jnp.ones(g.shape_padded, jnp.float64)
    r = st_mod.residual(st, u, f, unknown)
    r = np.asarray(r)
    assert np.all(r[0, :] == 0) and np.all(r[:, 0] == 0)
    assert np.all(r[g.nx - 1, :] == 0) and np.all(r[16:, :] == 0)
    np.testing.assert_allclose(r[1 : g.nx - 1, 1 : g.ny - 1], 1.0)


def test_neumann_edge_equation_exact():
    # u = x^2+y^2 with east Neumann: discrete equation is exact (see
    # ops/stencil.py ghost elimination) -> residual 0 everywhere unknown
    prob = P.neumann_test_problem(17)
    g = prob.grid
    st = st_mod.make_stencil(g, prob.spec, dtype=jnp.float64)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded, prob.spec)
    r = st_mod.residual(st, jnp.asarray(prob.exact), prob.rhs(jnp.float64), unknown)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


def test_unknown_mask_kinds():
    g = Grid(9, 9)
    m_d = np.asarray(bc_mod.unknown_mask(9, 9, g.shape_padded, bc_mod.dirichlet()))
    assert m_d.sum() == 7 * 7
    m_n = np.asarray(
        bc_mod.unknown_mask(9, 9, g.shape_padded, bc_mod.mixed(east="neumann"))
    )
    assert m_n.sum() == 7 * 8  # east ring unknowns included (minus corners)
