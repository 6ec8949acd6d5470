"""Visualization smoke tests: every figure function renders and saves
(reference had root-level dashboard/visualization smoke scripts; these run
headless via the Agg backend)."""

import numpy as np
import pytest

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.visualization import (
    AnalysisVisualizer,
    ConvergencePlotter,
    GridVisualizer,
    InteractivePlotter,
    PerformancePlotter,
    SolutionVisualizer,
    SolverDashboard,
)

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def grid():
    return Grid(17, 17)


@pytest.fixture(scope="module")
def field(grid):
    X, Y = grid.coordinates(padded=True)
    return np.sin(np.pi * X) * np.sin(np.pi * Y)


def _close(fig):
    import matplotlib.pyplot as plt

    plt.close(fig)


class TestSolutionPlots:
    def test_surface_contour_comparison(self, grid, field, tmp_path):
        v = SolutionVisualizer()
        _close(v.plot_surface(grid, field, save=tmp_path / "s.png"))
        _close(v.plot_contour(grid, field))
        _close(v.plot_comparison(grid, field, field * 0.99))
        _close(v.plot_error_map(grid, field, field * 0.99))
        assert (tmp_path / "s.png").exists()

    def test_time_series(self, grid, field):
        v = SolutionVisualizer()
        snaps = [(0.0, field), (0.1, field * 0.5), (0.2, field * 0.25)]
        _close(v.plot_time_series(grid, snaps))


class TestConvergencePlots:
    def test_histories_and_grid_convergence(self, tmp_path):
        p = ConvergencePlotter()
        _close(p.plot_residual_history(
            {"V(2,2)": [1, 0.1, 0.01], "W": [1, 0.05, 0.003]}, tol=1e-8))
        _close(p.plot_grid_convergence([0.1, 0.05, 0.025],
                                       [1e-2, 2.6e-3, 6e-4]))
        _close(p.plot_convergence_factors({"129": 0.08, "257": 0.09}))


class TestPerformancePlots:
    def test_benchmark_plots(self):
        p = PerformancePlotter()
        recs = [
            {"n": 129, "precision": "fp32", "dof_per_s": 1e8, "wall_s": 1e-3},
            {"n": 257, "precision": "fp32", "dof_per_s": 2e8, "wall_s": 3e-3},
            {"n": 129, "precision": "fp64", "dof_per_s": 5e7, "wall_s": 2e-3},
            {"n": 257, "precision": "fp64", "dof_per_s": 1e8, "wall_s": 6e-3},
        ]
        _close(p.plot_throughput(recs))
        _close(p.plot_solve_times(recs))
        _close(p.plot_precision_speedup({129: {"fp32": 2.0}, 257: {"fp32": 2.0}}))
        _close(p.plot_scaling_efficiency([1, 2, 4, 8], [1.0, 0.95, 0.9, 0.85]))
        rows = [
            {"solver": "ours_fp64", "n": 129, "wall_s": 1e-3, "available": True},
            {"solver": "scipy_cg", "n": 129, "wall_s": 1e-2, "available": True},
        ]
        _close(p.plot_baseline_comparison(rows))


class TestGridAndAnalysis:
    def test_grid_plots(self, grid):
        g = GridVisualizer()
        _close(g.plot_hierarchy([grid, grid.coarsen()]))
        _close(g.plot_coarsening_path(Grid(65, 65)))
        _close(g.plot_sharding_layout(Grid(129, 129), (2, 4)))

    def test_analysis_plots(self, grid, field):
        a = AnalysisVisualizer()
        _close(a.plot_error_spectrum(grid, field))
        _close(a.plot_smoothing_effect(grid, field, field * 0.3))
        _close(a.plot_method_comparison({"jacobi": [1, 0.5, 0.25]}))
        _close(a.plot_precision_tradeoff(
            [{"wall_s": 1e-3, "error_l2": 1e-6, "precision": "fp32", "n": 65}]))


class TestInteractiveAndDashboard:
    def test_parameter_sweep(self):
        ip = InteractivePlotter()
        fig, results = ip.parameter_sweep(
            lambda v: {"iterations": v * 2, "convergence_factor": 0.1},
            [1, 2, 3], param_name="sweeps")
        _close(fig)
        assert len(results) == 3

    def test_dashboard_renders(self, tmp_path):
        d = SolverDashboard()
        for r in [1.0, 0.1, 0.01, 1e-3, 1e-4]:
            d.record(r)
        fig = d.render(save=tmp_path / "dash.png")
        _close(fig)
        assert (tmp_path / "dash.png").exists()
