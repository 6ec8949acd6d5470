"""3D multigrid tests — capability the reference stubbed
(reference applications/poisson_solver.py:483-557)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid3d import Grid3D
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems3d as P3
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
    stencil3d as st3,
    transfer3d,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import multigrid3d as mg3
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig,
)

jax.config.update("jax_enable_x64", True)

CFG = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-10)


class TestGrid3D:
    def test_spacing_and_shapes(self):
        g = Grid3D(17, 33, 65)
        assert g.hx == pytest.approx(1 / 16)
        assert g.hz == pytest.approx(1 / 64)
        px, py, pz = g.shape_padded
        # x rounds to even (parity-plane transfers); trailing dims to tiles
        assert px == 18 and py % 16 == 0 and pz % 128 == 0

    def test_coarsen_refine_roundtrip(self):
        g = Grid3D(17, 17, 17)
        assert g.coarsen().shape == (9, 9, 9)
        assert g.coarsen().refine().shape == g.shape

    def test_pad_unpad(self):
        g = Grid3D(5, 5, 5)
        f = np.arange(125, dtype=np.float64).reshape(5, 5, 5)
        np.testing.assert_array_equal(g.unpad_field(g.pad_field(f)), f)


class TestStencil3D:
    def test_exact_on_quadratic(self):
        """A(x^2+y^2+z^2) = -6 exactly for the 7-point stencil."""
        g = Grid3D(9, 9, 9)
        st = st3.make_stencil3d(g, dtype=jnp.float64)
        X, Y, Z = g.coordinates(padded=True)
        u = jnp.asarray(X**2 + Y**2 + Z**2)
        Au = st3.apply(st, u)
        unknown = st3.unknown_mask3d(g)
        vals = np.asarray(jnp.where(unknown, Au, -6.0))
        np.testing.assert_allclose(vals, -6.0, atol=1e-9)

    def test_helmholtz_shift(self):
        g = Grid3D(9, 9, 9)
        st0 = st3.make_stencil3d(g, dtype=jnp.float64)
        st1 = st3.make_stencil3d(g, lam=5.0, dtype=jnp.float64)
        assert float(st1.c - st0.c) == pytest.approx(5.0)


class TestTransfer3D:
    def test_restriction_preserves_constants(self):
        gf = Grid3D(17, 17, 17)
        gc = gf.coarsen()
        ones = jnp.ones(gf.shape_padded, jnp.float64)
        out = transfer3d.restrict3d(ones, gc.nx, gc.ny, gc.nz, gc.shape_padded)
        interior = np.asarray(out)[1: gc.nx - 1, 1: gc.ny - 1, 1: gc.nz - 1]
        np.testing.assert_allclose(interior, 1.0, atol=1e-12)

    def test_prolongation_exact_on_trilinear(self):
        """Trilinear interpolation reproduces trilinear functions exactly."""
        gc = Grid3D(9, 9, 9)
        gf = gc.refine()
        Xc, Yc, Zc = gc.coordinates(padded=True)
        u_c = jnp.asarray(2 * Xc + 3 * Yc - Zc + Xc * Yc * 0)
        out = transfer3d.prolong3d(u_c, gc.nx, gc.ny, gc.nz,
                                   gf.nx, gf.ny, gf.nz, gf.shape_padded)
        Xf, Yf, Zf = gf.coordinates()
        expect = 2 * Xf + 3 * Yf - Zf
        got = np.asarray(out)[: gf.nx, : gf.ny, : gf.nz]
        np.testing.assert_allclose(got, expect, atol=1e-12)


class TestSolve3D:
    def test_poisson3d_converges_h_independent(self):
        iters = {}
        for n in (17, 33):
            prob = P3.poisson3d_mms_sinsinsin(n)
            levels = mg3.build_hierarchy3d(prob.grid, dtype="float64", cfg=CFG)
            u, info = mg3.mg_solve3d(
                levels, prob.rhs(jnp.float64), prob.initial_guess(jnp.float64),
                CFG)
            assert info["converged"]
            assert info["convergence_factor"] < 0.2
            iters[n] = info["iterations"]
        assert abs(iters[17] - iters[33]) <= 2

    def test_poisson3d_second_order(self):
        errs = []
        for n in (9, 17, 33):
            prob = P3.poisson3d_mms_sinsinsin(n)
            levels = mg3.build_hierarchy3d(prob.grid, dtype="float64", cfg=CFG)
            u, info = mg3.mg_solve3d(
                levels, prob.rhs(jnp.float64), prob.initial_guess(jnp.float64),
                CFG)
            errs.append(prob.error_norms(u)["l2"])
        rates = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
        assert np.all(rates > 1.7) and np.all(rates < 2.3), (errs, rates)

    def test_polynomial_exact(self):
        """Tri-quadratic u is NOT exactly discretized in 3D? It is:
        4th derivatives vanish -> machine-level error."""
        prob = P3.poisson3d_mms_polynomial(17)
        levels = mg3.build_hierarchy3d(prob.grid, dtype="float64", cfg=CFG)
        u, info = mg3.mg_solve3d(
            levels, prob.rhs(jnp.float64), prob.initial_guess(jnp.float64), CFG)
        assert prob.error_norms(u)["l2"] < 1e-9

    def test_helmholtz3d(self):
        prob = P3.helmholtz3d_mms(17)
        levels = mg3.build_hierarchy3d(prob.grid, lam=prob.lam,
                                       dtype="float64", cfg=CFG)
        u, info = mg3.mg_solve3d(
            levels, prob.rhs(jnp.float64), prob.initial_guess(jnp.float64), CFG)
        assert info["converged"]
        assert prob.error_norms(u)["l2"] < 5e-3

    def test_varcoef3d(self):
        prob = P3.varcoef3d_mms(17)
        a = jnp.asarray(prob.a)
        levels = mg3.build_hierarchy3d(prob.grid, a=a, dtype="float64", cfg=CFG)
        u, info = mg3.mg_solve3d(
            levels, prob.rhs(jnp.float64), prob.initial_guess(jnp.float64), CFG)
        assert info["converged"]
        assert prob.error_norms(u)["l2"] < 5e-3

    def test_w_cycle3d(self):
        prob = P3.poisson3d_mms_sinsinsin(17)
        cfg = CFG.replace(cycle="W")
        levels = mg3.build_hierarchy3d(prob.grid, dtype="float64", cfg=cfg)
        u, info = mg3.mg_solve3d(
            levels, prob.rhs(jnp.float64), prob.initial_guess(jnp.float64), cfg)
        assert info["converged"]
        assert info["convergence_factor"] < 0.15


class Test3DBoundaryConditions:
    """BoundarySpec3D through the whole 3D stack (VERDICT.md next-round #5;
    the reference had no 3D BCs at all)."""

    def _order(self, factory, sizes=(17, 33)):
        errs = []
        iters = []
        for n in sizes:
            prob = factory(n)
            levels = mg3.build_hierarchy3d(prob.grid, prob.spec, a=prob.a,
                                           lam=prob.lam, dtype="float64",
                                           cfg=CFG)
            u, info = mg3.mg_solve3d(levels, prob.rhs(jnp.float64),
                                     prob.initial_guess(jnp.float64), CFG)
            assert info["converged"], (factory.__name__, n, info)
            errs.append(prob.error_norms(u)["l2"])
            iters.append(info["iterations"])
        return np.log(errs[0] / errs[1]) / np.log(2), iters

    def test_neumann3d_order2(self):
        order, iters = self._order(P3.neumann3d_test)
        assert order > 1.85
        assert max(iters) - min(iters) <= 2  # h-independent

    def test_periodic3d_order2(self):
        order, iters = self._order(P3.periodic3d_helmholtz)
        assert order > 1.85

    def test_line_z_beats_point_smoother_on_anisotropy(self):
        prob = P3.anisotropic3d_z(33, aspect=0.1)
        rhos = {}
        for sm in ("rbgs", "line_z"):
            cfg = CFG.replace(smoother=sm, max_iterations=40)
            levels = mg3.build_hierarchy3d(prob.grid, prob.spec,
                                           dtype="float64", cfg=cfg)
            u, info = mg3.mg_solve3d(levels, prob.rhs(jnp.float64),
                                     prob.initial_guess(jnp.float64), cfg)
            rhos[sm] = info["convergence_factor"]
        assert rhos["line_z"] < 0.1          # textbook rate restored
        assert rhos["rbgs"] > 0.5            # point smoother stalls

    def test_robin3d_solves(self):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.core.bc import (
            BCSide, BCKind)
        from mixed_precision_multigrid_solvers_for_pdes_tpu.core.bc3d import (
            mixed3d)
        # u = x^2 + y^2 + z^2, f = -6; Robin on top: u + du/dz = x^2+y^2+3
        spec = mixed3d(top=BCSide(kind=BCKind.ROBIN, alpha=1.0, beta=1.0))
        g = Grid3D(17, 17, 17)
        prob = P3.from_callables3(
            "robin3d", g,
            u_exact=lambda X, Y, Z: X**2 + Y**2 + Z**2,
            f=lambda X, Y, Z: -6.0 + 0.0 * X,
            spec=spec,
            bc_values={"top": lambda: None},  # replaced below
        )
        X, Y, Z = g.coordinates(padded=True)
        gvals = np.zeros(g.shape_padded)
        gvals[:, :, g.nz - 1] = (X**2 + Y**2 + 3.0)[:, :, g.nz - 1]
        prob = type(prob)(**{**prob.__dict__,
                             "bc_values": {"top": gvals}})
        levels = mg3.build_hierarchy3d(g, spec, dtype="float64", cfg=CFG)
        u, info = mg3.mg_solve3d(levels, prob.rhs(jnp.float64),
                                 prob.initial_guess(jnp.float64), CFG)
        assert info["converged"]
        # one-sided Robin elimination is O(h)-consistent pointwise but the
        # global error stays small
        assert prob.error_norms(u)["l2"] < 5e-2


class Test3DSharding:
    def test_sharded_3d_matches_single(self):
        if jax.device_count() < 8:
            pytest.skip("needs the 8-device mesh")
        from mixed_precision_multigrid_solvers_for_pdes_tpu import parallel
        from mixed_precision_multigrid_solvers_for_pdes_tpu.parallel.distributed import (
            make_constrainer3d)
        from mixed_precision_multigrid_solvers_for_pdes_tpu.parallel.mesh import (
            grid_sharding3d)

        mesh = parallel.make_mesh(jax.devices()[:8], shape=(2, 4))
        prob = P3.poisson3d_mms_sinsinsin(33)
        levels = mg3.build_hierarchy3d(prob.grid, prob.spec, dtype="float64",
                                       cfg=CFG)
        f = prob.rhs(jnp.float64)
        u_ref, info_ref = mg3.mg_solve3d(levels, f, cfg=CFG)
        con = make_constrainer3d(mesh, min_points_per_device=4)
        sh = grid_sharding3d(mesh, levels[0].grid, 4)
        f_sh = jax.device_put(f, sh)
        u_sh, info_sh = mg3.mg_solve3d(levels, f_sh, cfg=CFG, constrain=con)
        assert info_sh["iterations"] == info_ref["iterations"]
        np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                                   rtol=0, atol=1e-11)

    def test_sharded_heat3d_matches_single(self):
        if jax.device_count() < 8:
            pytest.skip("needs the 8-device mesh")
        from mixed_precision_multigrid_solvers_for_pdes_tpu import parallel
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat3d import (
            HeatConfig, pure_diffusion3d, solve_heat3d,
        )

        mesh = parallel.make_mesh(jax.devices()[:8], shape=(2, 4))
        cfg = HeatConfig(scheme="crank_nicolson", cycles_per_step=2,
                         dtype="float64", mg=CFG)
        prob = pure_diffusion3d(17)
        ref = solve_heat3d(prob, t_final=0.01, dt=0.002, cfg=cfg)
        sh = solve_heat3d(pure_diffusion3d(17), t_final=0.01, dt=0.002,
                          cfg=cfg, mesh=mesh)
        np.testing.assert_allclose(np.asarray(sh["u"]), np.asarray(ref["u"]),
                                   rtol=0, atol=1e-12)
        assert sh["errors"]["l2"] < 5e-3


class TestKrylov3D:
    def test_mg_preconditioned_cg_3d(self):
        """3D MG-preconditioned CG: symmetric V-cycles keep the operator SPD;
        converges in a handful of iterations and hits O(h^2) accuracy
        (the reference had no 3D solver at all, poisson_solver.py:483-557)."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.preconditioning import (
            multigrid_preconditioner3d,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import krylov

        # varcoef: broad spectrum (sin*sin*sin is a Laplacian eigenvector and
        # would make plain CG converge in one step)
        prob = P3.varcoef3d_mms(33)
        cfg = CFG.replace(symmetric=True)
        levels = mg3.build_hierarchy3d(prob.grid, prob.spec, a=prob.a,
                                       lam=prob.lam, dtype="float64", cfg=cfg)
        lev0 = levels[0]
        mv = krylov.stencil_matvec3d(lev0.stencil, lev0.unknown)
        M = multigrid_preconditioner3d(levels, cfg)
        f = jnp.where(lev0.unknown, prob.rhs(jnp.float64), 0.0)

        u_plain, info_plain = krylov.pcg(mv, f, tol=1e-10, maxiter=500)
        u, info = krylov.pcg(mv, f, precond=M, tol=1e-10, maxiter=50)
        assert info["converged"], info
        assert info["iterations"] <= 12
        assert info["iterations"] < info_plain["iterations"]
        assert prob.error_norms(u)["l2"] < 5e-3
        # residual history is real and monotone-ish at the tail
        assert len(info["history"]) == info["iterations"] + 1


class TestPoisson3DFrontend:
    def test_solve_poisson3d_fp64(self):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
            solve_poisson3d,
        )
        res = solve_poisson3d(P3.poisson3d_mms_sinsinsin(33),
                              precision="fp64", cfg=CFG)
        assert res.converged
        assert res.errors["l2"] < 2e-3

    def test_solve_poisson3d_mixed_reaches_fp64_accuracy(self):
        """'mixed': fp32 cycles + float64 IR outer reaches tolerances fp32
        alone cannot (3D sibling of the 2D mixed path)."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
            solve_poisson3d,
        )
        cfg = CFG.replace(tol=1e-11)
        res = solve_poisson3d(P3.poisson3d_mms_sinsinsin(33),
                              precision="mixed", cfg=cfg)
        assert res.converged
        assert res.info["method"] == "iterative_refinement_3d"
        assert res.info["residual_norm"] <= 1e-11 * max(
            res.info["rhs_norm"], res.info["initial_residual_norm"])

    @pytest.mark.slow
    def test_solve_poisson3d_sharded_matches_single(self):
        from mixed_precision_multigrid_solvers_for_pdes_tpu import parallel
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
            solve_poisson3d,
        )
        mesh = parallel.make_mesh(jax.devices()[:8])
        prob = P3.varcoef3d_mms(17)
        r1 = solve_poisson3d(prob, precision="fp64", cfg=CFG)
        r2 = solve_poisson3d(prob, precision="fp64", cfg=CFG, mesh=mesh)
        assert r2.converged
        np.testing.assert_allclose(np.asarray(r2.u), np.asarray(r1.u),
                                   rtol=0, atol=1e-12)
        # mixed (fp32 cycles + f64 IR outer) through the same mesh: the
        # constrain threading in _ir3_jit must preserve numerics exactly
        m1 = solve_poisson3d(prob, precision="mixed", cfg=CFG)
        m2 = solve_poisson3d(prob, precision="mixed", cfg=CFG, mesh=mesh)
        assert m2.converged
        np.testing.assert_allclose(np.asarray(m2.u), np.asarray(m1.u),
                                   rtol=0, atol=1e-12)

    def test_convergence_study3d_order2(self):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
            convergence_study3d,
        )
        st = convergence_study3d(P3.poisson3d_mms_sinsinsin, [9, 17, 33],
                                 precision="fp64", cfg=CFG)
        assert st["converged"]
        assert 1.8 < st["order_l2"] < 2.2
        assert 1.8 < st["order_h1"] < 2.2

    @pytest.mark.slow
    def test_solve_poisson3d_adaptive(self):
        """Staged promotion in 3D: fp32 chunks then IR finish to 1e-10."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
            solve_poisson3d,
        )
        cfg = CFG.replace(tol=1e-10)
        res = solve_poisson3d(P3.poisson3d_mms_sinsinsin(33),
                              precision="adaptive", cfg=cfg)
        assert res.converged
        assert res.info["method"] == "adaptive_3d"
        # started fp32, finished with an IR stage
        assert any(kind == "ir" for _, kind in res.info["precision_switches"])
        assert res.errors["l2"] < 2e-3


class TestHeat3DProblems:
    def test_heat_source3d_steady_state(self):
        """Time-independent manufactured source: integration stays on the
        steady profile (error bounded by spatial truncation)."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat3d import (
            heat_source3d,
            solve_heat3d,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
            HeatConfig,
        )
        out = solve_heat3d(heat_source3d(17), t_final=0.02, dt=0.002,
                           cfg=HeatConfig(scheme="crank_nicolson",
                                          dtype="float64"))
        assert out["errors"]["l2"] < 5e-3

    def test_oscillating3d_order2_in_space(self):
        """Time-dependent source: CN at small dt shows spatial order 2."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat3d import (
            oscillating3d,
            solve_heat3d,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
            HeatConfig,
        )
        errs = {}
        for n in (9, 17):
            out = solve_heat3d(oscillating3d(n), t_final=0.01, dt=5e-4,
                               cfg=HeatConfig(scheme="crank_nicolson",
                                              dtype="float64",
                                              cycles_per_step=2))
            errs[n] = out["errors"]["l2"]
        order = np.log2(errs[9] / errs[17])
        assert 1.7 < order < 2.3


def test_sharded_line_z_matches_single():
    """Zebra line-z smoothing under a 2D device mesh: grid_sharding3d keeps
    z local, so every PCR tridiagonal solve stays on one device (no
    cross-device line splits) — sharded solve must bit-match single device
    on the anisotropic problem that NEEDS the line smoother."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device mesh")
    from mixed_precision_multigrid_solvers_for_pdes_tpu import parallel
    from mixed_precision_multigrid_solvers_for_pdes_tpu.parallel.distributed import (
        make_constrainer3d)
    from mixed_precision_multigrid_solvers_for_pdes_tpu.parallel.mesh import (
        grid_sharding3d)

    mesh = parallel.make_mesh(jax.devices()[:8], shape=(2, 4))
    prob = P3.anisotropic3d_z(33, aspect=0.1)
    cfg = CFG.replace(smoother="line_z", max_iterations=40)
    levels = mg3.build_hierarchy3d(prob.grid, prob.spec, dtype="float64",
                                   cfg=cfg)
    f = prob.rhs(jnp.float64)
    u_ref, info_ref = mg3.mg_solve3d(levels, f, cfg=cfg)
    con = make_constrainer3d(mesh, min_points_per_device=4)
    f_sh = jax.device_put(f, grid_sharding3d(mesh, levels[0].grid, 4))
    u_sh, info_sh = mg3.mg_solve3d(levels, f_sh, cfg=cfg, constrain=con)
    assert info_sh["iterations"] == info_ref["iterations"]
    assert info_sh["convergence_factor"] < 0.1
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=0, atol=1e-11)


def test_per_level_dtypes_3d():
    """PrecisionPolicy('mixed') assigns fp32 fine / bf16 coarse levels in 3D
    (2D parity, multigrid.py:149-152); IR over the mixed ladder still
    reaches 1e-10."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.core.precision import (
        policy as make_policy,
    )

    prob = P3.poisson3d_mms_sinsinsin(33)
    cfg = CFG.replace(tol=1e-10)
    levels = mg3.build_hierarchy3d(prob.grid, prob.spec,
                                   policy=make_policy("mixed"), cfg=cfg)
    dts = [str(l.dtype) for l in levels]
    assert dts[0] == "float32" and dts[-1] == "bfloat16"
    u, info = mg3.ir_solve3d(levels, prob.rhs(jnp.float64), None, cfg,
                             inner_cycles=2)
    assert info["converged"]
    assert prob.error_norms(u)["l2"] < 2e-3
