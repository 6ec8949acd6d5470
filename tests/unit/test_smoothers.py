"""Smoother tests incl. exact equivalence with a loop-based reference
implementation (reference tests/unit/test_iterative_solvers.py)."""

import jax.numpy as jnp
import numpy as np

from mixed_precision_multigrid_solvers_for_pdes_tpu.core import bc as bc_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
    norms,
    smooth as sm,
    stencil as st_mod,
)


def _setup(n=17):
    g = Grid(n, n)
    st = st_mod.make_stencil(g, dtype=jnp.float64)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded, bc_mod.dirichlet())
    rng = np.random.default_rng(7)
    f = np.zeros((n, n))
    f[1:-1, 1:-1] = rng.standard_normal((n - 2, n - 2))
    f = jnp.asarray(g.pad_field(f))
    u0 = jnp.zeros(g.shape_padded, jnp.float64)
    return g, st, unknown, f, u0


def _numpy_rbgs_sweep(u, f, n, h2, omega=1.0):
    """Loop-based red-black GS on the logical grid (ground truth)."""
    u = u.copy()
    for color in (0, 1):
        for i in range(1, n - 1):
            for j in range(1, n - 1):
                if (i + j) % 2 == color:
                    u_gs = (
                        u[i - 1, j] + u[i + 1, j] + u[i, j - 1] + u[i, j + 1]
                        + h2 * f[i, j]
                    ) / 4.0
                    u[i, j] = u[i, j] + omega * (u_gs - u[i, j])
    return u


def test_rbgs_matches_loop_reference():
    g, st, unknown, f, u0 = _setup(9)
    u1 = np.asarray(sm.rbgs_sweep(st, u0, f, unknown, 1.0))
    ref = _numpy_rbgs_sweep(
        np.zeros((9, 9)), np.asarray(f)[:9, :9], 9, g.hx**2
    )
    np.testing.assert_allclose(u1[:9, :9], ref, rtol=1e-12, atol=1e-14)


def test_jacobi_reduces_residual():
    g, st, unknown, f, u = _setup()
    r0 = norms.scaled_l2(st_mod.residual(st, u, f, unknown), g.hx, g.hy)
    for _ in range(10):
        u = sm.jacobi_sweep(st, u, f, unknown, 0.8)
    r1 = norms.scaled_l2(st_mod.residual(st, u, f, unknown), g.hx, g.hy)
    assert float(r1) < 0.7 * float(r0)


def test_rbgs_faster_than_jacobi():
    # asymptotically GS halves the Jacobi rate; needs enough sweeps to show
    g, st, unknown, f, u0 = _setup()
    uj, ug = u0, u0
    for _ in range(30):
        uj = sm.jacobi_sweep(st, uj, f, unknown, 0.8)
        ug = sm.rbgs_sweep(st, ug, f, unknown, 1.0)
    rj = float(norms.scaled_l2(st_mod.residual(st, uj, f, unknown), g.hx, g.hy))
    rg = float(norms.scaled_l2(st_mod.residual(st, ug, f, unknown), g.hx, g.hy))
    assert rg < rj


def test_smoothers_fix_boundary_and_padding():
    g, st, unknown, f, u0 = _setup()
    u = sm.smooth(st, u0, f, unknown, method="rbgs", sweeps=3, omega=1.0)
    u = np.asarray(u)
    assert np.all(u[0, :] == 0) and np.all(u[g.nx - 1, :] == 0)
    assert np.all(u[g.nx :, :] == 0) and np.all(u[:, g.ny :] == 0)


def test_sor_omega_helper():
    w = sm.optimal_sor_omega(65, 65)
    assert 1.8 < w < 2.0


def test_smooth_many_sweeps_fori_loop_path():
    g, st, unknown, f, u0 = _setup(9)
    u_loop = sm.smooth(st, u0, f, unknown, method="jacobi", sweeps=8, omega=0.8)
    u_unrolled = u0
    for _ in range(8):
        u_unrolled = sm.jacobi_sweep(st, u_unrolled, f, unknown, 0.8)
    np.testing.assert_allclose(np.asarray(u_loop), np.asarray(u_unrolled), rtol=1e-12)
