"""Benchmark suite: sizes x solver-configs x precisions, honest timing.

Counterpart of reference gpu/gpu_benchmark.py:43-666 (GPUBenchmarkSuite:
sizes x {cpu,gpu,gpu_ca} x {single,double,mixed_tc} with warmup, speedup and
scaling analyses) — minus the reference's simulated fallback. Reports include
DoF/s, iteration counts, convergence factors and scaling exponents; everything
is measured with compile excluded and device sync included.
"""

from __future__ import annotations

import dataclasses
import json
import platform
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from ..applications.poisson import solve_poisson
from ..models.problems import Problem
from ..solvers.multigrid import MultigridConfig
from ..utils.timing import benchmark_function


@dataclasses.dataclass
class BenchmarkRecord:
    name: str
    n: int
    precision: str
    wall_s: float
    std_s: float
    iterations: int
    converged: bool
    convergence_factor: float
    dof_per_s: float
    error_l2: Optional[float]

    def to_dict(self):
        return dataclasses.asdict(self)


def system_info() -> Dict[str, Any]:
    """Real environment capture (reference performance_analysis.py:75-120
    used psutil/pynvml; here: platform + jax devices)."""
    dev = jax.devices()[0]
    return {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device": str(dev.device_kind if hasattr(dev, "device_kind") else dev),
        "n_devices": jax.device_count(),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }


class BenchmarkSuite:
    def __init__(
        self,
        problem_factory: Callable[[int], Problem],
        cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0,
                                               tol=1e-8),
    ):
        self.problem_factory = problem_factory
        self.cfg = cfg
        self.records: List[BenchmarkRecord] = []

    def run_one(self, n: int, precision: str, *, runs: int = 5,
                warmup: int = 1) -> BenchmarkRecord:
        prob = self.problem_factory(n)

        def solve():
            return solve_poisson(prob, precision=precision, cfg=self.cfg)

        res = solve()  # compile + correctness
        stats = benchmark_function(solve, warmup=max(warmup - 1, 0), runs=runs)
        dofs = (n - 2) ** 2
        rec = BenchmarkRecord(
            name=prob.name, n=n, precision=precision,
            wall_s=stats["min_s"], std_s=stats["std_s"],
            iterations=res.iterations, converged=res.converged,
            convergence_factor=res.info.get("convergence_factor", float("nan")),
            dof_per_s=dofs / stats["min_s"],
            error_l2=res.errors["l2"] if res.errors else None,
        )
        self.records.append(rec)
        return rec

    def run(self, sizes: Sequence[int] = (129, 257, 513, 1025),
            precisions: Sequence[str] = ("fp32", "fp64", "mixed"),
            *, runs: int = 5) -> List[BenchmarkRecord]:
        for n in sizes:
            for p in precisions:
                self.run_one(n, p, runs=runs)
        return self.records

    # ---- analyses (reference gpu_benchmark.py:277-500) ----------------------

    def precision_speedups(self) -> Dict[int, Dict[str, float]]:
        """Speedup of each precision vs fp64 at the same size
        (the reference's 1.7x mixed-precision headline, README.md:34)."""
        out: Dict[int, Dict[str, float]] = {}
        by_n: Dict[int, Dict[str, float]] = {}
        for r in self.records:
            by_n.setdefault(r.n, {})[r.precision] = r.wall_s
        for n, d in by_n.items():
            if "fp64" in d:
                out[n] = {p: d["fp64"] / t for p, t in d.items() if p != "fp64"}
        return out

    def scaling_exponent(self, precision: str = "fp32") -> float:
        """Fit wall_s ~ N^p — ideal multigrid is p=1 (O(N))."""
        rows = [r for r in self.records if r.precision == precision]
        if len(rows) < 2:
            return float("nan")
        N = np.array([(r.n - 2) ** 2 for r in rows], float)
        t = np.array([r.wall_s for r in rows], float)
        return float(np.polyfit(np.log(N), np.log(t), 1)[0])

    def report(self) -> Dict[str, Any]:
        return {
            "system": system_info(),
            "config": dataclasses.asdict(self.cfg),
            "records": [r.to_dict() for r in self.records],
            "precision_speedups": self.precision_speedups(),
            "scaling_exponents": {
                p: self.scaling_exponent(p)
                for p in {r.precision for r in self.records}
            },
        }

    def report_markdown(self) -> str:
        lines = [
            "# Benchmark report (measured; no simulated data)",
            "",
            f"system: `{system_info()}`",
            "",
            "| problem | n | precision | time (s) | iters | rho | MDoF/s | l2 error |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in self.records:
            err = f"{r.error_l2:.2e}" if r.error_l2 is not None else "-"
            lines.append(
                f"| {r.name} | {r.n} | {r.precision} | {r.wall_s:.4f} | "
                f"{r.iterations} | {r.convergence_factor:.3f} | "
                f"{r.dof_per_s / 1e6:.2f} | {err} |"
            )
        return "\n".join(lines)

    def save(self, path) -> None:
        path = Path(path)
        if path.suffix == ".md":
            path.write_text(self.report_markdown())
        else:
            path.write_text(json.dumps(self.report(), indent=2))
