#!/usr/bin/env python
"""Run the performance benchmark battery and write honest reports.

Counterpart of the reference's run_benchmarks.py — minus its simulated
fallback (reference run_benchmarks.py:42-56 synthesized results with
np.random). Includes the reference's headline scenarios:
- sizes x precisions solver benchmark (DoF/s, speedups vs fp64, O(N) check)
- heat stepping throughput: implicit steps at a fixed cycle budget
  (BASELINE.md config 4: 1025^2, one-or-two V-cycles per step)
- external baselines (scipy / pyamg) on the same discrete systems

Usage: python scripts/run_benchmarks.py [--quick] [--out reports/]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.applications import (  # noqa: E402
    HeatConfig,
    heat_problems,
    solve_heat,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.benchmarking import (  # noqa: E402
    BenchmarkSuite,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.benchmarking.suite import (  # noqa: E402
    system_info,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)


def heat_stepping_bench(n: int, n_steps: int) -> dict:
    """Implicit heat stepping at a fixed cycle budget, whole run in one scan
    (BASELINE.md: 'one V-cycle per implicit step')."""
    prob = heat_problems.pure_diffusion(n)
    cfg = HeatConfig(
        scheme="crank_nicolson", cycles_per_step=1, step_rtol=0.0,
        dtype="float32", mg=MultigridConfig(smoother="rbgs", omega=1.0),
    )
    dt = 0.1 / n_steps
    res = solve_heat(prob, t_final=0.1, dt=dt, cfg=cfg)  # compile + warm
    t0 = time.perf_counter()
    res = solve_heat(prob, t_final=0.1, dt=dt, cfg=cfg)
    jax.block_until_ready(res.u)
    wall = time.perf_counter() - t0
    return {
        "n": n,
        "steps": n_steps,
        "wall_s": wall,
        "steps_per_s": n_steps / wall,
        "dof_steps_per_s": (n - 2) ** 2 * n_steps / wall,
        "final_l2_error": res.errors["l2"] if res.errors else None,
    }


def poisson3d_bench(n: int, runs: int = 3) -> dict:
    """3D mixed-precision solve (capability the reference stubbed,
    reference applications/poisson_solver.py:483)."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems3d as P3
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid3d import (
        build_hierarchy3d,
        ir_solve3d,
    )

    prob = P3.poisson3d_mms_sinsinsin(n)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-9)
    levels = build_hierarchy3d(prob.grid, dtype="float32", cfg=cfg)
    f = prob.rhs(jnp.float64)
    u, info = ir_solve3d(levels, f, None, cfg)  # compile + converge check
    t0 = time.perf_counter()
    for _ in range(runs):
        u, info = ir_solve3d(levels, f, None, cfg)
    wall = (time.perf_counter() - t0) / runs
    return {
        "n": n,
        "wall_s": wall,
        "dof_per_s": (n - 2) ** 3 / wall,
        "iterations": info["iterations"],
        "converged": info["converged"],
        "error_l2": prob.error_norms(u)["l2"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="reports")
    ap.add_argument("--baselines", action="store_true",
                    help="also run scipy/pyamg external baselines (CPU)")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    sizes = (129, 257) if args.quick else (129, 257, 513, 1025)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-8)

    suite = BenchmarkSuite(P.poisson_mms_sinsin, cfg)
    suite.run(sizes=sizes, precisions=("fp32", "fp64", "mixed"),
              runs=3 if args.quick else 5)
    report = suite.report()

    heat = [heat_stepping_bench(129 if args.quick else 513,
                                50 if args.quick else 200)]
    if not args.quick:
        heat.append(heat_stepping_bench(1025, 100))
    report["heat_stepping"] = heat

    report["poisson3d"] = [poisson3d_bench(65 if args.quick else 129)]
    if not args.quick:
        report["poisson3d"].append(poisson3d_bench(257))

    if args.baselines:
        from mixed_precision_multigrid_solvers_for_pdes_tpu.validation import (
            PerformanceBaselines,
        )

        pb = PerformanceBaselines(cfg)
        pb.run_suite(P.poisson_mms_sinsin,
                     sizes=(65, 129) if args.quick else (65, 129, 257))
        report["external_baselines"] = pb.report()

    (out / "benchmark_report.json").write_text(
        json.dumps(report, indent=2, default=float))
    md = [suite.report_markdown(), "", "## Heat stepping (implicit, fixed "
          "cycle budget)", "",
          "| n | steps | wall (s) | steps/s | final L2 err |", "|---|---|---|---|---|"]
    for h in heat:
        md.append(f"| {h['n']} | {h['steps']} | {h['wall_s']:.3f} | "
                  f"{h['steps_per_s']:.1f} | {h['final_l2_error']:.2e} |")
    (out / "benchmark_report.md").write_text("\n".join(md))

    print(json.dumps({
        "system": system_info()["device"],
        "speedups_vs_fp64": report["precision_speedups"],
        "scaling_exponents": report["scaling_exponents"],
        "heat_steps_per_s": [h["steps_per_s"] for h in heat],
    }, default=float))


if __name__ == "__main__":
    main()
