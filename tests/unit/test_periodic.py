"""Periodic boundary conditions: wrap-ghost machinery end to end.

The reference's periodic support stopped at array wrap copies
(reference boundary_conditions/advanced_bc.py:182-217) and never reached its
solvers; here periodic problems run through the full multigrid stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
from mixed_precision_multigrid_solvers_for_pdes_tpu.core import bc as bc_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.bc import (
    BCKind,
    BCSide,
    BoundarySpec,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import stencil as st_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import krylov
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig,
)

CFG = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-10)
PER = BoundarySpec(*(BCSide(kind=BCKind.PERIODIC),) * 4)


class TestMasksAndSync:
    def test_unknown_mask_periodic(self):
        g = Grid(9, 9)
        m = np.asarray(bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded, PER))
        # unknowns are 0..n-2 on both axes; duplicates/padding excluded
        assert m[:8, :8].all()
        assert not m[8, :].any() and not m[:, 8].any()

    def test_periodic_sync_ghosts(self):
        g = Grid(9, 9)
        sync = bc_mod.periodic_sync(g.nx, g.ny, g.shape_padded, PER)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(g.shape_padded))
        u = sync(u)
        px, py = g.shape_padded
        np.testing.assert_array_equal(np.asarray(u)[8, :], np.asarray(u)[0, :])
        np.testing.assert_array_equal(np.asarray(u)[px - 1, :],
                                      np.asarray(u)[7, :])
        np.testing.assert_array_equal(np.asarray(u)[:, py - 1],
                                      np.asarray(u)[:, 7])

    def test_operator_exact_on_periodic_mode(self):
        """A u = (8 pi^2 lambda-free part + 1) u must hold discretely for the
        discrete eigenmode of the periodic Laplacian."""
        g = Grid(17, 17)
        st = st_mod.make_stencil(g, PER, lam=1.0, dtype=jnp.float64)
        sync = bc_mod.periodic_sync(g.nx, g.ny, g.shape_padded, PER)
        unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded, PER)
        X, Y = g.coordinates(padded=True)
        u = jnp.asarray(np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
        # discrete eigenvalue of the 5-point Laplacian for mode (2,2)
        h = g.hx
        lam_h = 2 * (2 - np.cos(2 * np.pi * h) - np.cos(2 * np.pi * h)) / h**2
        Au = st_mod.apply(st, sync(u))
        expect = (lam_h + 1.0) * u
        err = jnp.where(unknown, Au - expect, 0.0)
        assert float(jnp.max(jnp.abs(err))) < 1e-8


class TestPeriodicSolve:
    def test_mg_converges_second_order(self):
        errs, iters = [], []
        for n in (17, 33, 65):
            prob = P.periodic_helmholtz_mms(n)
            levels = mg.build_hierarchy(prob.grid, prob.spec, lam=prob.lam,
                                        dtype="float64", cfg=CFG)
            u, info = mg.mg_solve(levels, prob.rhs(jnp.float64),
                                  prob.initial_guess(jnp.float64), CFG)
            assert info["converged"], n
            assert info["convergence_factor"] < 0.2
            errs.append(prob.error_norms(u)["l2"])
            iters.append(info["iterations"])
        rates = np.log2(np.asarray(errs[:-1]) / np.asarray(errs[1:]))
        assert np.all(rates > 1.7) and np.all(rates < 2.3), (errs, rates)
        assert max(iters) - min(iters) <= 2  # h-independent

    def test_periodic_duplicate_consistent(self):
        prob = P.periodic_helmholtz_mms(33)
        levels = mg.build_hierarchy(prob.grid, prob.spec, lam=prob.lam,
                                    dtype="float64", cfg=CFG)
        u, _ = mg.mg_solve(levels, prob.rhs(jnp.float64), None, CFG)
        u = np.asarray(u)
        np.testing.assert_allclose(u[32, :33], u[0, :33], atol=1e-12)
        np.testing.assert_allclose(u[:33, 32], u[:33, 0], atol=1e-12)

    def test_periodic_cg(self):
        prob = P.periodic_helmholtz_mms(33)
        levels = mg.build_hierarchy(prob.grid, prob.spec, lam=prob.lam,
                                    dtype="float64", cfg=CFG)
        lev0 = levels[0]
        mv = krylov.stencil_matvec(lev0.stencil, lev0.unknown, lev0.sync)
        f = jnp.where(lev0.unknown, prob.rhs(jnp.float64), 0.0)
        u, info = krylov.pcg(mv, f, tol=1e-10)
        assert info["converged"]
        # compare against the MG solution on the unknown set
        u_mg, _ = mg.mg_solve(levels, prob.rhs(jnp.float64), None, CFG)
        un = np.asarray(lev0.unknown)
        np.testing.assert_allclose(np.asarray(u)[un], np.asarray(u_mg)[un],
                                   atol=1e-8)


class TestCyclicLines:
    def test_cyclic_tridiagonal_exact(self):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.tridiag import (
            cyclic_tridiagonal_solve,
        )

        rng = np.random.default_rng(0)
        n = 31
        dl = rng.standard_normal((4, n))
        du = rng.standard_normal((4, n))
        d = 5.0 + np.abs(dl) + np.abs(du)
        b = rng.standard_normal((4, n))
        x = np.asarray(cyclic_tridiagonal_solve(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du), jnp.asarray(b),
            axis=-1))
        for k in range(4):
            A = (np.diag(d[k]) + np.diag(dl[k][1:], -1)
                 + np.diag(du[k][:-1], 1))
            A[0, n - 1] = dl[k][0]
            A[n - 1, 0] = du[k][n - 1]
            assert (np.linalg.norm(A @ x[k] - b[k])
                    < 1e-10 * np.linalg.norm(b[k]))

    @pytest.mark.slow
    def test_periodic_adi_multigrid(self):
        """Line/ADI smoothing across periodic seams (cyclic tridiagonal via
        Sherman-Morrison over PCR)."""
        prob = P.periodic_helmholtz_mms(33)
        cfg = CFG.replace(smoother="adi")
        levels = mg.build_hierarchy(prob.grid, prob.spec, lam=prob.lam,
                                    dtype="float64", cfg=cfg)
        u, info = mg.mg_solve(levels, prob.rhs(jnp.float64), None, cfg)
        assert info["converged"]
        assert prob.error_norms(u)["l2"] < 5e-3


class TestPeriodicHeat:
    def test_periodic_diffusion(self):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat import (
            HeatConfig,
            HeatProblem,
            solve_heat,
        )

        PI = np.pi

        def exact(X, Y, t):
            return (jnp.sin(2 * PI * X) * jnp.cos(2 * PI * Y)
                    * jnp.exp(-8 * PI**2 * t))

        g = Grid(33, 33)
        X, Y = g.coordinates(padded=True)
        u0 = np.array(exact(jnp.asarray(X), jnp.asarray(Y), 0.0))
        u0[g.nx:, :] = 0.0
        u0[:, g.ny:] = 0.0
        prob = HeatProblem("heat_periodic", g, alpha=1.0, spec=PER, u0=u0,
                           exact=exact)
        cfg = HeatConfig(scheme="crank_nicolson", dtype="float64")
        res = solve_heat(prob, t_final=0.01, dt=0.001, cfg=cfg)
        assert res.errors["l2"] < 2e-3, res.errors
