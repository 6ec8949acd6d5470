"""Single-chip 4097^2 benchmark rows (VERDICT r4 missing #4).

The reference publishes weak-scaling claims up to 4097^2
(reference docs/results.md:376-384); multi-chip is hardware-blocked here
(one real chip via the tunnel; MULTICHIP_r0*.json dryruns cover the sharded
path), but the single-chip 4097^2 fp32 + mixed rows are feasible and were
absent from every report. This runs exactly those cells (plus the xla arm
for the backend A/B) and MERGES them into reports/benchmark_report.{json,md}
without re-running the full suite.

Run on the real chip: python scripts/xl_row.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from mixed_precision_multigrid_solvers_for_pdes_tpu.benchmarking.suite import (  # noqa: E402
    BenchmarkSuite,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)


def main():
    out = Path("reports")
    print(f"# backend={jax.default_backend()}", flush=True)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-8)
    suite = BenchmarkSuite(P.poisson_mms_sinsin, cfg)
    suite.run(sizes=(4097,), precisions=("fp32", "mixed"), runs=3)
    suite.run(sizes=(4097,), precisions=("fp32", "mixed"), runs=3,
              backends=("xla",))
    for r in suite.records:
        print(f"4097 {r.precision:5s} {r.backend:4s} {r.wall_s:.4f} s  "
              f"{r.dof_per_s / 1e6:.1f} MDoF/s  iters={r.iterations} "
              f"err={r.error_l2:.2e}", flush=True)

    rp = out / "benchmark_report.json"
    report = json.loads(rp.read_text())
    report["records"] = [r for r in report["records"] if r["n"] != 4097]
    report["records"] += [r.to_dict() for r in suite.records]
    for cell, sp in suite.backend_speedups().items():
        report["backend_speedups"][cell] = sp
    rp.write_text(json.dumps(report, indent=2, default=float))

    md_path = out / "benchmark_report.md"
    md = md_path.read_text()
    sec = ["", "## 4097^2 single-chip stretch rows (scripts/xl_row.py)", "",
           "Reference's largest published size (docs/results.md:376-384, "
           "there via 8-GPU weak scaling; here ONE v5e chip). Per-solve "
           "wall includes the ~30 ms tunnel fixed cost.", "",
           "| n | precision | backend | time (s) | iters | MDoF/s | "
           "l2 error |", "|---|---|---|---|---|---|---|"]
    for r in suite.records:
        sec.append(f"| {r.n} | {r.precision} | {r.backend} | "
                   f"{r.wall_s:.4f} | {r.iterations} | "
                   f"{r.dof_per_s / 1e6:.1f} | {r.error_l2:.2e} |")
    for cell, sp in suite.backend_speedups().items():
        sec.append("")
        sec.append(f"backend speedup {cell}: {sp:.2f}x (t_xla / t_auto)")
    marker = "## 4097^2 single-chip stretch rows"
    if marker in md:
        md = md[: md.index(marker)].rstrip() + "\n"
    md_path.write_text(md.rstrip() + "\n" + "\n".join(sec) + "\n")
    print("merged into reports/benchmark_report.{json,md}")


if __name__ == "__main__":
    main()
