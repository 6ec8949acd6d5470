"""Heat-equation time stepping tests (reference test strategy: MMS ladders,
temporal order checks — reference validation/mms_validation.py:471-553)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
    heat_problems as HP,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat import (
    HeatConfig,
    solve_heat,
    stability_limit_dt,
)

jax.config.update("jax_enable_x64", True)


def _solve(problem, scheme, t_final, dt, **kw):
    cfg = HeatConfig(scheme=scheme, cycles_per_step=2, dtype="float64", **kw)
    return solve_heat(problem, t_final=t_final, dt=dt, cfg=cfg)


class TestSchemes:
    def test_crank_nicolson_accuracy(self):
        res = _solve(HP.pure_diffusion(33), "crank_nicolson", 0.05, 0.005)
        assert res.errors["l2"] < 5e-4

    def test_backward_euler_first_order_in_dt(self):
        """Halving dt halves the BE error (spatial error subdominant here)."""
        e = [
            _solve(HP.pure_diffusion(65), "backward_euler", 0.04, dt).errors["l2"]
            for dt in (0.004, 0.002)
        ]
        rate = np.log2(e[0] / e[1])
        assert 0.7 < rate < 1.3, (e, rate)

    def test_crank_nicolson_second_order_in_dt(self):
        # spatially-exact problem: the measured error is purely temporal
        e = [
            _solve(HP.spatially_exact_oscillating(33), "crank_nicolson",
                   0.1, dt).errors["l2"]
            for dt in (0.01, 0.005)
        ]
        rate = np.log2(e[0] / e[1])
        assert 1.6 < rate < 2.4, (e, rate)

    def test_bdf2_second_order_in_dt(self):
        e = [
            _solve(HP.spatially_exact_oscillating(33), "bdf2", 0.1, dt
                   ).errors["l2"]
            for dt in (0.01, 0.005)
        ]
        rate = np.log2(e[0] / e[1])
        assert 1.5 < rate < 2.6, (e, rate)

    def test_theta_matches_limits(self):
        prob = HP.pure_diffusion(33)
        be = _solve(prob, "backward_euler", 0.02, 0.004).errors["l2"]
        th1 = solve_heat(
            prob, t_final=0.02, dt=0.004,
            cfg=HeatConfig(scheme="theta", theta=1.0, cycles_per_step=2,
                           dtype="float64"),
        ).errors["l2"]
        assert np.isclose(be, th1, rtol=1e-10)

    def test_explicit_stability_guard(self):
        prob = HP.pure_diffusion(33)
        limit = stability_limit_dt(prob.grid, prob.alpha)
        with pytest.raises(ValueError):
            solve_heat(prob, t_final=0.1, dt=10 * limit,
                       cfg=HeatConfig(scheme="explicit"))

    def test_explicit_matches_exact(self):
        res = _solve(HP.pure_diffusion(33), "explicit", 0.01, None)
        assert res.errors["l2"] < 5e-4


class TestSourcesAndBCs:
    def test_manufactured_source(self):
        """Source-balanced steady state stays steady."""
        res = _solve(HP.heat_source(33), "crank_nicolson", 0.1, 0.01)
        assert res.errors["l2"] < 2e-3

    def test_time_dependent_dirichlet(self):
        res = _solve(HP.time_dependent_bc(33), "crank_nicolson", 0.1, 0.01)
        # u is quadratic in space, linear in t: CN + exact BCs -> ~exact
        assert res.errors["l2"] < 1e-6

    def test_polynomial_time_bdf2_near_exact(self):
        """BDF2 integrates quadratic-in-time exactly; u quadratic in space."""
        res = _solve(HP.polynomial_time(33), "bdf2", 0.1, 0.01)
        assert res.errors["l2"] < 1e-6

    def test_neumann_heat(self):
        res = _solve(HP.neumann_heat(33), "crank_nicolson", 0.05, 0.005)
        assert res.errors["l2"] < 5e-3


class TestVariableStepBDF2:
    """Variable-step BDF2 coefficients (r = dt/dt_prev) are exact on
    solutions quadratic in time; with quadratic-in-space data the whole
    step is exact, so any coefficient error shows up directly."""

    @staticmethod
    def _quad_quad_problem(n=33, alpha=1.0):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat import (
            heat_problem_from_callables,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid

        def exact(X, Y, t):
            return (X**2 + Y**2) * (1 + t + t * t)

        def q(X, Y, t):
            return (X**2 + Y**2) * (1 + 2 * t) - 4 * alpha * (1 + t + t * t)

        return heat_problem_from_callables(
            "quad_quad", Grid(n, n), alpha=alpha, exact=exact, q=q
        )

    def test_unequal_steps_exact_on_quadratics(self):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat import (
            make_step_fn,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
            multigrid as mg_mod,
        )

        prob = self._quad_quad_problem()
        cfg = HeatConfig(scheme="bdf2", cycles_per_step=2, dtype="float64",
                         step_rtol=1e-12, max_cycles_per_step=30)
        levels0 = mg_mod.build_hierarchy(
            prob.grid, prob.spec, lam=0.0, dtype="float64", cfg=cfg.mg
        )
        step = make_step_fn(prob, levels0, cfg)
        X, Y = prob.mesh(jnp.float64)
        t0, dt_prev, dt = 0.1, 0.02, 0.05  # r = 2.5
        u_prev = jnp.asarray(prob.exact(X, Y, t0))
        u = jnp.asarray(prob.exact(X, Y, t0 + dt_prev))
        got = step(u_prev, u, jnp.asarray(t0 + dt_prev), jnp.asarray(dt),
                   jnp.asarray(dt_prev))
        want = np.asarray(prob.exact(X, Y, t0 + dt_prev + dt))
        # padded region is zero in `got`; compare the logical region only
        nx, ny = prob.grid.nx, prob.grid.ny
        np.testing.assert_allclose(np.asarray(got)[:nx, :ny],
                                   want[:nx, :ny], atol=1e-9)

    def test_r_equal_one_matches_uniform_formula(self):
        """dt_prev=dt must reproduce the fixed-dt (classic 3,-4,1) path."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat import (
            make_step_fn,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
            multigrid as mg_mod,
        )

        prob = HP.oscillating(33)
        cfg = HeatConfig(scheme="bdf2", cycles_per_step=2, dtype="float64")
        levels0 = mg_mod.build_hierarchy(
            prob.grid, prob.spec, lam=0.0, dtype="float64", cfg=cfg.mg
        )
        step = make_step_fn(prob, levels0, cfg)
        X, Y = prob.mesh(jnp.float64)
        dt = 0.01
        u_prev = jnp.asarray(prob.exact(X, Y, 0.0))
        u = jnp.asarray(prob.exact(X, Y, dt))
        a = step(u_prev, u, jnp.asarray(dt), jnp.asarray(dt))
        b = step(u_prev, u, jnp.asarray(dt), jnp.asarray(dt),
                 jnp.asarray(dt))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-13)

    @pytest.mark.slow
    def test_adaptive_bdf2_reaches_tolerance(self):
        prob = HP.oscillating(33)
        cfg = HeatConfig(
            scheme="bdf2", cycles_per_step=2, dtype="float64",
            adaptive_dt=True, dt_tol=1e-5,
        )
        res = solve_heat(prob, t_final=0.1, dt=0.02, cfg=cfg)
        assert res.t == pytest.approx(0.1, abs=1e-10)
        assert res.steps >= 5
        assert res.errors["l2"] < 1e-3
        assert res.dt_history.size == res.steps


class TestAdaptiveDt:
    def test_adaptive_reaches_tolerance(self):
        prob = HP.oscillating(33)
        cfg = HeatConfig(
            scheme="crank_nicolson", cycles_per_step=2, dtype="float64",
            adaptive_dt=True, dt_tol=1e-5,
        )
        res = solve_heat(prob, t_final=0.1, dt=0.02, cfg=cfg)
        assert res.t == pytest.approx(0.1, abs=1e-10)
        assert res.steps >= 5
        assert res.errors["l2"] < 1e-3
        assert res.dt_history.size == res.steps


class TestSpatialConvergence:
    def test_second_order_in_h(self):
        """O(h^2) once dt error is subdominant (CN, small dt)."""
        errs = []
        for n in (17, 33, 65):
            res = _solve(HP.pure_diffusion(n), "crank_nicolson", 0.02, 0.001)
            errs.append(res.errors["l2"])
        r1 = np.log2(errs[0] / errs[1])
        r2 = np.log2(errs[1] / errs[2])
        assert 1.7 < r1 < 2.3 and 1.7 < r2 < 2.3, (errs, r1, r2)


class TestSaveHistory:
    def test_save_every(self):
        prob = HP.pure_diffusion(17)
        cfg = HeatConfig(scheme="backward_euler", cycles_per_step=2,
                         dtype="float64", save_every=2)
        res = solve_heat(prob, t_final=0.02, dt=0.002, cfg=cfg)
        assert res.saved is not None and len(res.saved) == 5
        t_last, u_last = res.saved[-1]
        assert t_last == pytest.approx(0.02)
        np.testing.assert_allclose(u_last, np.asarray(res.u), rtol=1e-12)


class TestCheckpointResume:
    """Chunked-scan checkpoint/resume (the reference persisted results only,
    SURVEY.md section 5)."""

    def _cfg(self, scheme="crank_nicolson", **kw):
        return HeatConfig(scheme=scheme, cycles_per_step=2, dtype="float64",
                          **kw)

    def test_resume_matches_uninterrupted(self, tmp_path):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils.checkpoint import (
            CheckpointManager,
        )
        ref = solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10,
                         cfg=self._cfg())
        ck = CheckpointManager(tmp_path / "ck")
        # phase 1: only the first half (simulates preemption after step 5)
        solve_heat(HP.pure_diffusion(17), t_final=0.01, n_steps=5,
                   cfg=self._cfg(), checkpoint=ck, checkpoint_every=5)
        assert ck.latest_step() == 5
        # phase 2: same dt, full horizon -> resumes at 5, runs 5 more
        res = solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10,
                         cfg=self._cfg(), checkpoint=ck, checkpoint_every=5)
        assert ck.latest_step() == 10
        assert res.t == pytest.approx(0.02, abs=1e-12)
        np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                                   rtol=0, atol=0)

    def test_bdf2_resume_keeps_two_step_history(self, tmp_path):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils.checkpoint import (
            CheckpointManager,
        )
        ref = solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10,
                         cfg=self._cfg("bdf2"))
        ck = CheckpointManager(tmp_path / "ck")
        solve_heat(HP.pure_diffusion(17), t_final=0.008, n_steps=4,
                   cfg=self._cfg("bdf2"), checkpoint=ck, checkpoint_every=2)
        res = solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10,
                         cfg=self._cfg("bdf2"), checkpoint=ck,
                         checkpoint_every=3)
        np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                                   rtol=0, atol=0)

    def test_dt_mismatch_rejected(self, tmp_path):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils.checkpoint import (
            CheckpointManager,
        )
        ck = CheckpointManager(tmp_path / "ck")
        solve_heat(HP.pure_diffusion(17), t_final=0.01, n_steps=5,
                   cfg=self._cfg(), checkpoint=ck)
        with pytest.raises(ValueError, match="dt"):
            solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=7,
                       cfg=self._cfg(), checkpoint=ck)

    def test_save_every_alignment_enforced(self, tmp_path):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils.checkpoint import (
            CheckpointManager,
        )
        ck = CheckpointManager(tmp_path / "ck")
        with pytest.raises(ValueError, match="multiple of save_every"):
            solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10,
                       cfg=self._cfg(save_every=2), checkpoint=ck,
                       checkpoint_every=5)

    def test_save_every_across_chunks(self, tmp_path):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils.checkpoint import (
            CheckpointManager,
        )
        cfg = self._cfg(save_every=2)
        ref = solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10,
                         cfg=cfg)
        ck = CheckpointManager(tmp_path / "ck")
        res = solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10,
                         cfg=cfg, checkpoint=ck, checkpoint_every=4)
        assert len(res.saved) == len(ref.saved) == 5
        for (ta, ua), (tb, ub) in zip(res.saved, ref.saved):
            assert ta == pytest.approx(tb)
            np.testing.assert_allclose(ua, ub, rtol=0, atol=0)


def test_sharded_resume_matches_uninterrupted(tmp_path):
    """Kill-and-resume UNDER A MESH: the restore path must re-place the
    loaded host arrays on the device mesh; final state matches an
    uninterrupted single-device run bit-for-bit."""
    import jax

    from mixed_precision_multigrid_solvers_for_pdes_tpu import parallel
    from mixed_precision_multigrid_solvers_for_pdes_tpu.utils.checkpoint import (
        CheckpointManager,
    )

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device mesh")
    cfg = HeatConfig(scheme="bdf2", cycles_per_step=2, dtype="float64")
    mesh = parallel.make_mesh(jax.devices()[:8])
    ref = solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10, cfg=cfg)
    ck = CheckpointManager(tmp_path / "ck_mesh")
    solve_heat(HP.pure_diffusion(17), t_final=0.01, n_steps=5, cfg=cfg,
               mesh=mesh, checkpoint=ck, checkpoint_every=5)
    res = solve_heat(HP.pure_diffusion(17), t_final=0.02, n_steps=10, cfg=cfg,
                     mesh=mesh, checkpoint=ck, checkpoint_every=5)
    assert ck.latest_step() == 10
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=0, atol=1e-13)
