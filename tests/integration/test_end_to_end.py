"""End-to-end integration tests on REAL solves.

The reference's integration layer asserted against a MockSolver that
fabricated solutions (reference tests/integration/test_end_to_end.py:22-56);
every pipeline here runs the actual framework end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
from mixed_precision_multigrid_solvers_for_pdes_tpu import preconditioning as pc
from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (
    HeatConfig,
    heat_problems,
    solve_heat,
    solve_poisson,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.poisson import (
    convergence_study,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.precision_analysis import (
    MixedPrecisionAnalyzer,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import krylov
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig,
)

CFG = MultigridConfig(smoother="rbgs", omega=1.0)


class TestPoissonPipeline:
    def test_solve_all_precisions_consistent(self):
        """fp64 / fp32(+IR) / mixed must agree to discretization accuracy —
        the real version of the reference's GPU-CPU consistency pipeline."""
        prob = P.poisson_mms_sinsin(65)
        sols = {}
        for precision in ("fp64", "fp32", "mixed"):
            res = solve_poisson(prob, precision=precision,
                                cfg=CFG.replace(tol=1e-9))
            assert res.converged, precision
            sols[precision] = np.asarray(res.u, dtype=np.float64)
        for p in ("fp32", "mixed"):
            diff = np.abs(sols[p] - sols["fp64"]).max()
            assert diff < 1e-7, (p, diff)

    def test_convergence_study_end_to_end(self):
        study = convergence_study(P.poisson_mms_sinsin, [17, 33, 65],
                                  precision="fp64", cfg=CFG)
        assert study["converged"]
        assert abs(study["order_l2"] - 2.0) < 0.3

    def test_neumann_pipeline(self):
        res = solve_poisson(P.neumann_test_problem(65), precision="fp64",
                            cfg=CFG)
        assert res.converged
        assert res.errors["l2"] < 1e-3


class TestHeatPipeline:
    def test_heat_then_error(self):
        prob = heat_problems.pure_diffusion(33)
        cfg = HeatConfig(scheme="crank_nicolson", dtype="float64")
        res = solve_heat(prob, t_final=0.05, dt=0.005, cfg=cfg)
        assert res.errors["l2"] < 5e-4

    def test_heat3d_pipeline(self):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat3d import (
            pure_diffusion3d,
            solve_heat3d,
        )

        prob = pure_diffusion3d(17)
        cfg = HeatConfig(scheme="backward_euler", cycles_per_step=3,
                         dtype="float64")
        out = solve_heat3d(prob, t_final=0.01, dt=0.002, cfg=cfg)
        assert out["errors"]["l2"] < 5e-3

    @pytest.mark.slow
    def test_heat3d_bdf2_beats_backward_euler(self):
        """BDF2 (order 2, CN bootstrap) vs BE (order 1) at the same dt."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat3d import (
            pure_diffusion3d,
            solve_heat3d,
        )

        prob = pure_diffusion3d(17)
        errs = {}
        for scheme in ("backward_euler", "bdf2"):
            cfg = HeatConfig(scheme=scheme, cycles_per_step=3,
                             dtype="float64")
            out = solve_heat3d(prob, t_final=0.02, dt=0.004, cfg=cfg)
            errs[scheme] = out["errors"]["l2"]
        assert errs["bdf2"] < 0.3 * errs["backward_euler"], errs


class TestKrylovPipeline:
    def test_mg_preconditioned_cg_full_stack(self):
        prob = P.poisson_mms_exponential(65)
        levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float64",
                                    cfg=CFG)
        lev0 = levels[0]
        mv = krylov.stencil_matvec(lev0.stencil, lev0.unknown)
        f = jnp.where(lev0.unknown, prob.rhs(jnp.float64), 0.0)
        M = pc.multigrid_preconditioner(levels, CFG)
        u, info = krylov.pcg(mv, f, precond=M, tol=1e-10)
        assert info["converged"] and info["iterations"] <= 12
        assert prob.error_norms(u)["l2"] < 5e-3


class TestPrecisionAnalysisPipeline:
    def test_tradeoff_table(self):
        an = MixedPrecisionAnalyzer(CFG.replace(tol=1e-8))
        an.analyze(P.poisson_mms_sinsin(65), runs=1,
                   configs=("fp64", "fp32", "mixed"))
        t = an.tradeoffs()
        assert "fp32" in t and "mixed" in t
        assert t["mixed"]["memory_saving"] > 0.2
        # accuracy loss bounded (reference criterion: within 10x of fp64,
        # docs/results.md:451-458)
        assert t["fp32"]["error_ratio_vs_fp64"] < 10.0

    def test_checkpoint_resume_midway(self, tmp_path):
        """Stop a time integration, checkpoint, resume — states must match a
        straight-through run (capability the reference lacked entirely)."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils import (
            CheckpointManager,
        )

        prob = heat_problems.pure_diffusion(17)
        cfg = HeatConfig(scheme="backward_euler", dtype="float64")
        full = solve_heat(prob, t_final=0.02, dt=0.002, cfg=cfg)

        half = solve_heat(prob, t_final=0.01, dt=0.002, cfg=cfg)
        mgr = CheckpointManager(tmp_path / "ck")
        mgr.save(half.steps, {"u": half.u}, {"t": half.t})
        arrays, meta = mgr.restore()
        prob2 = heat_problems.pure_diffusion(17)
        prob2.u0 = arrays["u"]
        # NOTE: resume shifts the time origin; pure_diffusion's q=0 and its
        # BCs are homogeneous, so the dynamics are time-invariant here.
        rest = solve_heat(prob2, t_final=0.01, dt=0.002, cfg=cfg)
        np.testing.assert_allclose(np.asarray(rest.u), np.asarray(full.u),
                                   rtol=0, atol=1e-12)


class TestHeat3DCheckpoint:
    @pytest.mark.slow
    def test_checkpoint_resume_bdf2_3d(self, tmp_path):
        """3D kill-and-resume: interrupted run (checkpoint at step 6 of 10)
        resumed to completion matches a straight-through run bit-for-bit,
        BDF2 two-step history included."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat3d import (
            pure_diffusion3d,
            solve_heat3d,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils import (
            CheckpointManager,
        )

        prob = pure_diffusion3d(17)
        cfg = HeatConfig(scheme="bdf2", dtype="float64")
        full = solve_heat3d(prob, t_final=0.02, dt=0.002, cfg=cfg)

        mgr = CheckpointManager(tmp_path / "ck3d")
        # "crash" after 6 of 10 steps
        solve_heat3d(prob, t_final=0.012, dt=0.002, cfg=cfg,
                     checkpoint=mgr, checkpoint_every=3)
        assert mgr.latest_step() == 6
        # resume the 10-step run from the saved (u_prev, u, t)
        rest = solve_heat3d(prob, t_final=0.02, dt=0.002, cfg=cfg,
                            checkpoint=mgr, checkpoint_every=3)
        np.testing.assert_allclose(np.asarray(rest["u"]),
                                   np.asarray(full["u"]),
                                   rtol=0, atol=1e-14)
        assert rest["errors"]["l2"] < 2e-3

    def test_resume_scheme_mismatch_rejected(self, tmp_path):
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat3d import (
            pure_diffusion3d,
            solve_heat3d,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils import (
            CheckpointManager,
        )

        prob = pure_diffusion3d(17)
        mgr = CheckpointManager(tmp_path / "ck3d_scheme")
        solve_heat3d(prob, t_final=0.006, dt=0.002,
                     cfg=HeatConfig(scheme="crank_nicolson", dtype="float64"),
                     checkpoint=mgr, checkpoint_every=2)
        with pytest.raises(ValueError, match="scheme"):
            solve_heat3d(prob, t_final=0.02, dt=0.002,
                         cfg=HeatConfig(scheme="bdf2", dtype="float64"),
                         checkpoint=mgr)

    def test_bdf2_single_step_still_checkpoints(self, tmp_path):
        """n_steps == 1 is fully covered by the CN bootstrap; the final
        state must still be saved (save-at-end contract)."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.applications.heat3d import (
            pure_diffusion3d,
            solve_heat3d,
        )
        from mixed_precision_multigrid_solvers_for_pdes_tpu.utils import (
            CheckpointManager,
        )

        prob = pure_diffusion3d(17)
        mgr = CheckpointManager(tmp_path / "ck3d_one")
        out = solve_heat3d(prob, t_final=0.002, dt=0.002,
                           cfg=HeatConfig(scheme="bdf2", dtype="float64"),
                           checkpoint=mgr)
        assert mgr.latest_step() == 1
        arrays, meta = mgr.restore()
        np.testing.assert_allclose(np.asarray(arrays["u"]),
                                   np.asarray(out["u"]), rtol=0, atol=0)
