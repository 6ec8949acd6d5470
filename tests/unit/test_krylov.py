"""Krylov + preconditioning tests (reference tests/unit/test_preconditioning.py
semantics: setup/apply, effectiveness by iteration-count reduction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
from mixed_precision_multigrid_solvers_for_pdes_tpu import preconditioning as pc
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import krylov
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig,
)

jax.config.update("jax_enable_x64", True)

CFG = MultigridConfig(smoother="rbgs", omega=1.0)


@pytest.fixture(scope="module")
def setup():
    # NOTE: sin(pi x) sin(pi y) is an eigenvector of the discrete Laplacian —
    # CG would converge in exactly 1 iteration and preconditioner comparisons
    # would be meaningless. The exponential problem has a broad spectrum.
    prob = P.poisson_mms_exponential(65)
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float64", cfg=CFG)
    lev0 = levels[0]
    mv = krylov.stencil_matvec(lev0.stencil, lev0.unknown)
    f = jnp.where(lev0.unknown, prob.rhs(jnp.float64), 0.0)
    return prob, levels, lev0, mv, f


def _check_solution(prob, u, tol=5e-3):
    errs = prob.error_norms(u)
    assert errs["l2"] < tol, errs


class TestCG:
    def test_plain_cg_converges(self, setup):
        prob, levels, lev0, mv, f = setup
        u, info = krylov.pcg(mv, f, tol=1e-10, maxiter=500)
        assert info["converged"], info
        _check_solution(prob, u)

    def test_jacobi_preconditioner(self, setup):
        prob, levels, lev0, mv, f = setup
        M = pc.diagonal(lev0.stencil, lev0.unknown)
        u, info = krylov.pcg(mv, f, precond=M, tol=1e-10)
        assert info["converged"]
        _check_solution(prob, u)

    def test_chebyshev_beats_jacobi(self, setup):
        prob, levels, lev0, mv, f = setup
        Mj = pc.diagonal(lev0.stencil, lev0.unknown)
        Mc = pc.chebyshev(lev0.stencil, lev0.unknown, degree=4, grid=lev0.grid)
        _, ij = krylov.pcg(mv, f, precond=Mj, tol=1e-10)
        _, ic = krylov.pcg(mv, f, precond=Mc, tol=1e-10)
        assert ic["converged"] and ij["converged"]
        assert ic["iterations"] < ij["iterations"]

    def test_mg_preconditioner_few_iterations(self, setup):
        prob, levels, lev0, mv, f = setup
        M = pc.multigrid_preconditioner(levels, CFG)
        u, info = krylov.pcg(mv, f, precond=M, tol=1e-10)
        assert info["converged"]
        assert info["iterations"] <= 12, info["iterations"]
        _check_solution(prob, u)

    def test_mg_preconditioned_cg_galerkin_jump(self):
        """SPD end-to-end on the hard case: symmetric V-cycles over a
        Galerkin hierarchy (RAP preserves symmetry of the coarse operators,
        so the preconditioner is provably SPD even with variable
        coefficients) on the 1e3:1 jump problem."""
        cfg = CFG.replace(coarsening="galerkin", symmetric=True)
        prob = P.jump_coefficient_problem(65)
        levels = mg.build_hierarchy(prob.grid, prob.spec, a=prob.a,
                                    dtype="float64", cfg=cfg)
        lev0 = levels[0]
        mv = krylov.stencil_matvec(lev0.stencil, lev0.unknown)
        f = jnp.where(lev0.unknown, prob.rhs(jnp.float64), 0.0)
        M = pc.multigrid_preconditioner(levels, cfg)
        u, info = krylov.pcg(mv, f, precond=M, tol=1e-10)
        assert info["converged"]
        assert info["iterations"] <= 10, info["iterations"]

    def test_line_preconditioner(self, setup):
        prob, levels, lev0, mv, f = setup
        M = pc.block_line(lev0.stencil, lev0.unknown, axis=0)
        _, i_line = krylov.pcg(mv, f, precond=M, tol=1e-10)
        _, i_none = krylov.pcg(mv, f, tol=1e-10)
        assert i_line["converged"]
        assert i_line["iterations"] < i_none["iterations"]


class TestBiCGStab:
    def test_converges_on_spd(self, setup):
        prob, levels, lev0, mv, f = setup
        M = pc.diagonal(lev0.stencil, lev0.unknown)
        u, info = krylov.bicgstab(mv, f, precond=M, tol=1e-10)
        assert info["converged"]
        _check_solution(prob, u)


class TestCombinators:
    def test_identity_and_composite(self, setup):
        prob, levels, lev0, mv, f = setup
        Mi = pc.identity()
        np.testing.assert_array_equal(np.asarray(Mi(f)), np.asarray(f))
        Mc = pc.composite(pc.diagonal(lev0.stencil, lev0.unknown), Mi)
        u, info = krylov.pcg(mv, f, precond=Mc, tol=1e-8)
        assert info["converged"]

    def test_adaptive_switches_on_stall(self):
        a = pc.AdaptivePreconditioner([pc.identity(), pc.identity()], window=3)
        # stalling history: ratios ~ 1
        assert a.observe([1.0, 0.99, 0.985, 0.984, 0.9835]) is True
        assert a.active == 1


class TestILU:
    def test_ilu_reduces_host_cg_iterations(self, setup):
        """ILU(0)-PCG needs substantially fewer iterations than plain CG —
        the effectiveness criterion the reference's preconditioner study used
        (reference tests/unit/test_preconditioning.py)."""
        import scipy.sparse.linalg as spla

        prob, levels, lev0, mv, f = setup
        ilu = pc.ILUPreconditioner(lev0.grid, lev0.stencil, lev0.unknown)
        un = np.asarray(lev0.unknown)
        ii, jj = np.nonzero(un)
        nn = ii.size
        pad_shape = lev0.grid.shape_padded

        def pack(fun):
            def mvec(xv):
                xp = np.zeros(pad_shape)
                xp[ii, jj] = xv
                return np.asarray(fun(jnp.asarray(xp)))[ii, jj]

            return mvec

        A_op = spla.LinearOperator((nn, nn), matvec=pack(mv))
        M_op = spla.LinearOperator((nn, nn), matvec=pack(ilu))
        b = np.asarray(f)[ii, jj]

        def count(M=None):
            k = [0]
            _, info = spla.cg(A_op, b, rtol=1e-8, maxiter=2000, M=M,
                              callback=lambda _: k.__setitem__(0, k[0] + 1))
            assert info == 0
            return k[0]

        plain, with_ilu = count(), count(M_op)
        assert with_ilu < 0.6 * plain, (plain, with_ilu)
        mem = ilu.memory_usage()
        assert mem["fill_ratio"] == 1.0

    def test_iluk_matches_ilu0_at_level0(self, setup):
        """The general ILU(k) path at k=0 reproduces the vectorized
        wavefront ILU(0) exactly (same algorithm, different sweep order)."""
        prob, levels, lev0, mv, f = setup
        un = np.asarray(lev0.unknown)
        rng = np.random.default_rng(0)
        r = np.where(un, rng.standard_normal(un.shape), 0.0)
        z0 = pc.ILUPreconditioner(lev0.grid, lev0.stencil, lev0.unknown)(r)
        zk = pc.ILUKPreconditioner(lev0.grid, lev0.stencil, lev0.unknown,
                                   fill_level=0)(r)
        assert np.max(np.abs(np.asarray(z0) - np.asarray(zk))) < 1e-11

    def test_iluk_quality_improves_with_fill(self, setup):
        """One-shot preconditioned residual ||A M^{-1} r - r||/||r|| drops
        monotonically with fill level, and full fill is an exact LU solve
        (the property the reference's fill_level knob was supposed to
        deliver; its _allow_fill never implemented k>0,
        reference preconditioning/ilu.py:253-264)."""
        prob, levels, lev0, mv, f = setup
        un = np.asarray(lev0.unknown)
        rng = np.random.default_rng(1)
        r = np.where(un, rng.standard_normal(un.shape), 0.0)

        def one_shot(M):
            Az = np.where(un, np.asarray(mv(jnp.asarray(M(r)))), 0.0)
            return np.linalg.norm(Az - r) / np.linalg.norm(r)

        res = []
        for k in (0, 1, 3):
            M = pc.ILUKPreconditioner(lev0.grid, lev0.stencil, lev0.unknown,
                                      fill_level=k)
            res.append(one_shot(M))
        assert res[1] < res[0] and res[2] < res[1], res
        exact = pc.ILUKPreconditioner(lev0.grid, lev0.stencil, lev0.unknown,
                                      fill_level=10**6)
        assert one_shot(exact) < 1e-10
        assert exact.memory_usage()["fill_ratio"] > 2.0

    def test_ilut_drop_and_milu(self, setup):
        """Drop tolerance sparsifies the factors; MILU keeps a working
        preconditioner; apply_transpose is the adjoint of apply."""
        prob, levels, lev0, mv, f = setup
        un = np.asarray(lev0.unknown)
        rng = np.random.default_rng(2)
        r = np.where(un, rng.standard_normal(un.shape), 0.0)
        full = pc.ILUKPreconditioner(lev0.grid, lev0.stencil, lev0.unknown,
                                     fill_level=5)
        ilut = pc.ILUKPreconditioner(lev0.grid, lev0.stencil, lev0.unknown,
                                     fill_level=5, drop_tolerance=5e-2)
        assert (ilut.memory_usage()["factor_nnz"]
                < full.memory_usage()["factor_nnz"])
        milu = pc.ILUKPreconditioner(lev0.grid, lev0.stencil, lev0.unknown,
                                     fill_level=1, drop_tolerance=1e-3,
                                     milu=True)
        z = milu(r)
        assert np.all(np.isfinite(np.asarray(z)))
        a = np.where(un, rng.standard_normal(un.shape), 0.0)
        b = np.where(un, rng.standard_normal(un.shape), 0.0)
        M = pc.ILUKPreconditioner(lev0.grid, lev0.stencil, lev0.unknown,
                                  fill_level=2)
        lhs = float(np.sum(M.apply_transpose(a) * b))
        rhs = float(np.sum(a * M.apply(b)))
        assert abs(lhs - rhs) < 1e-10 * abs(rhs)


class TestGMRES:
    def test_gmres_converges(self, setup):
        prob, levels, lev0, mv, f = setup
        M = pc.multigrid_preconditioner(levels, CFG)
        u, info = krylov.gmres(mv, f, precond=M, tol=1e-8, restart=20)
        assert info["converged"], info
        _check_solution(prob, u)


class TestHostPCG:
    def test_pcg_host_matches_device_pcg(self, setup):
        """The NumPy host loop (for ILU-class preconditioners) reproduces
        the jitted PCG: same iteration count, same solution."""
        prob, levels, lev0, mv, f = setup
        u_dev, info_dev = krylov.pcg(mv, f, tol=1e-8, maxiter=500)
        mv_np = krylov.stencil_matvec_np(lev0.stencil, lev0.unknown)
        u_host, info_host = krylov.pcg_host(mv_np, np.asarray(f), tol=1e-8,
                                            maxiter=500)
        assert info_host["converged"]
        assert abs(info_host["iterations"] - info_dev["iterations"]) <= 1
        assert np.max(np.abs(u_host - np.asarray(u_dev))) < 1e-7

    def test_pcg_host_with_ilu(self, setup):
        """End-to-end host path: ILU(0)-preconditioned CG cuts iterations
        and solves the system (the production use of pcg_host)."""
        prob, levels, lev0, mv, f = setup
        mv_np = krylov.stencil_matvec_np(lev0.stencil, lev0.unknown)
        M = pc.ILUPreconditioner(lev0.grid, lev0.stencil, lev0.unknown)
        f_np = np.asarray(f)
        u_plain, info_plain = krylov.pcg_host(mv_np, f_np, tol=1e-8,
                                              maxiter=500)
        u_ilu, info_ilu = krylov.pcg_host(mv_np, f_np, precond=M, tol=1e-8,
                                          maxiter=500)
        assert info_ilu["converged"]
        assert info_ilu["iterations"] < 0.6 * info_plain["iterations"]
        _check_solution(prob, jnp.asarray(u_ilu))
