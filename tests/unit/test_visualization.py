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

    def test_slices3d_content(self, tmp_path):
        """Slice panels show the right plane data: the mid-z slice of
        sin*sin*sin peaks at the domain center with value ~1."""
        from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid3d import (
            Grid3D,
        )

        g = Grid3D(17, 17, 17)
        X, Y, Z = g.coordinates(padded=True)
        f = np.sin(np.pi * X) * np.sin(np.pi * Y) * np.sin(np.pi * Z)
        v = SolutionVisualizer()
        fig = v.plot_slices3d(g, f, axis="z", positions=(0.5,),
                              save=tmp_path / "sl.png")
        ax = fig.axes[0]
        img = ax.images[0].get_array()
        mid = (g.nx - 1) // 2
        assert abs(img[mid, mid] - 1.0) < 1e-6   # sin^3 peak at center
        assert abs(img[0, 0]) < 1e-12            # boundary zero
        assert (tmp_path / "sl.png").exists()
        _close(fig)


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


class TestPlotContent:
    """Pin plot CONTENT, not just render paths (VERDICT.md weak #8): the
    data that lands in the matplotlib artists must be the data passed in."""

    def test_residual_history_content(self):
        v = ConvergencePlotter()
        hist = [1.0, 0.1, 0.01, 1e-3]
        fig = v.plot_residual_history({"run": hist}, tol=1e-6)
        ax = fig.axes[0]
        lines = ax.get_lines()
        # first line: the history curve, y data exactly as given
        ys = lines[0].get_ydata()
        np.testing.assert_allclose(ys, hist)
        assert ax.get_yscale() == "log"
        # tol guide line present at the right level
        guides = [ln for ln in lines if np.allclose(ln.get_ydata(), 1e-6)]
        assert guides, "tolerance guide line missing"
        _close(fig)

    def test_grid_convergence_guide_slope(self):
        v = ConvergencePlotter()
        h = np.array([0.1, 0.05, 0.025])
        err = 3.0 * h**2
        fig = v.plot_grid_convergence(h, err, expected_order=2.0)
        ax = fig.axes[0]
        data_line, guide = ax.get_lines()[0], ax.get_lines()[1]
        np.testing.assert_allclose(data_line.get_ydata(), err)
        # the O(h^2) guide through the first point equals the data here
        np.testing.assert_allclose(guide.get_ydata(), err, rtol=1e-12)
        _close(fig)

    def test_error_map_image_values(self, grid, field):
        v = SolutionVisualizer()
        approx = field * 0.75
        fig = v.plot_error_map(grid, field, approx)
        ax = fig.axes[0]
        imgs = ax.get_images() + [c for c in ax.collections
                                  if hasattr(c, "get_array")]
        assert imgs, "no image/mesh artist in error map"
        arr = np.asarray(imgs[0].get_array())
        expected_max = float(np.abs(field - approx)[:grid.nx, :grid.ny].max())
        assert np.isclose(float(np.nanmax(arr)), expected_max, rtol=1e-6)
        _close(fig)

    def test_solution_contour_levels_bracket_data(self, grid, field):
        v = SolutionVisualizer()
        fig = v.plot_contour(grid, field)
        ax = fig.axes[0]
        cs = [c for c in ax.collections if hasattr(c, "levels")]
        assert cs, "no contour set on the axes"
        levels = np.asarray(cs[0].levels, float)
        lo = float(field[:grid.nx, :grid.ny].min())
        hi = float(field[:grid.nx, :grid.ny].max())
        assert levels.min() <= lo + 1e-9 and levels.max() >= hi - 1e-9, (
            levels.min(), levels.max(), lo, hi)
        _close(fig)
