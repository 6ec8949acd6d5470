"""Mixed-precision trade-off analysis: accuracy vs speed vs memory.

Counterpart of reference applications/mixed_precision_analysis.py:58-821
(MixedPrecisionAnalyzer: run the same problem at fp32/fp64/mixed/adaptive and
compare speedup, memory saving, accuracy loss). All numbers measured.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..models.problems import Problem
from ..solvers.multigrid import MultigridConfig
from ..utils.timing import benchmark_function
from .poisson import solve_poisson


def _hierarchy_bytes(problem: Problem, dtypes: Sequence) -> int:
    """Memory of (u, f, r) triples over the hierarchy at the given dtypes."""
    total = 0
    g = problem.grid
    for dt in dtypes:
        px, py = g.shape_padded
        total += 3 * px * py * jnp.dtype(dt).itemsize
        if not g.can_coarsen():
            break
        g = g.coarsen()
    return total


@dataclasses.dataclass
class PrecisionRecord:
    precision: str
    wall_s: float
    iterations: int
    converged: bool
    error_l2: Optional[float]
    hierarchy_bytes: int

    def to_dict(self):
        return dataclasses.asdict(self)


class MixedPrecisionAnalyzer:
    """Run one problem across precision configs and tabulate trade-offs
    (reference mixed_precision_analysis.py precision_configs:70-100)."""

    CONFIGS = ("fp64", "fp32", "mixed", "adaptive")

    def __init__(self, cfg: MultigridConfig = MultigridConfig(
            smoother="rbgs", omega=1.0, tol=1e-8)):
        self.cfg = cfg
        self.records: List[PrecisionRecord] = []

    def analyze(self, problem: Problem, *, runs: int = 3,
                configs: Sequence[str] = CONFIGS) -> List[PrecisionRecord]:
        from ..core.precision import PrecisionPolicy, Precision

        for precision in configs:
            res = solve_poisson(problem, precision=precision, cfg=self.cfg)
            stats = benchmark_function(
                lambda p=precision: solve_poisson(problem, precision=p,
                                                  cfg=self.cfg),
                warmup=0, runs=runs)
            if precision == "mixed":
                pol = PrecisionPolicy(mode=Precision.MIXED)
                n_levels = 10  # upper bound; bytes dominated by fine levels
                dtypes = pol.level_dtypes(n_levels)
            elif precision == "adaptive":
                dtypes = (jnp.float32,) * 10
            else:
                dtypes = (jnp.dtype(
                    {"fp32": jnp.float32, "fp64": jnp.float64,
                     "bf16": jnp.bfloat16}[precision]),) * 10
            self.records.append(PrecisionRecord(
                precision=precision,
                wall_s=stats["min_s"],
                iterations=res.iterations,
                converged=res.converged,
                error_l2=res.errors["l2"] if res.errors else None,
                hierarchy_bytes=_hierarchy_bytes(problem, dtypes),
            ))
        return self.records

    def tradeoffs(self) -> Dict[str, Any]:
        """Speedup / memory saving / accuracy loss vs the fp64 run
        (the reference's 1.7x / 31-35% / <10x-error criteria,
        reference docs/results.md:451-458)."""
        by = {r.precision: r for r in self.records}
        if "fp64" not in by:
            raise ValueError("analyze() must include the fp64 reference run")
        ref = by["fp64"]
        out: Dict[str, Any] = {}
        for p, r in by.items():
            if p == "fp64":
                continue
            entry = {
                "speedup_vs_fp64": ref.wall_s / r.wall_s,
                "memory_saving": 1.0 - r.hierarchy_bytes / ref.hierarchy_bytes,
                "iterations_ratio": r.iterations / max(ref.iterations, 1),
            }
            if r.error_l2 is not None and ref.error_l2:
                entry["error_ratio_vs_fp64"] = r.error_l2 / ref.error_l2
            out[p] = entry
        return out

    def report(self) -> Dict[str, Any]:
        return {
            "records": [r.to_dict() for r in self.records],
            "tradeoffs": self.tradeoffs(),
        }


# ---------------------------------------------------------------------------
# measured per-problem precision auto-tuner
# ---------------------------------------------------------------------------

_AUTOTUNE_CACHE: Dict[Any, str] = {}


def autotune(
    problem: Problem,
    *,
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0,
                                           tol=1e-8),
    candidates: Sequence[str] = ("fp32", "mixed", "adaptive"),
    runs: int = 3,
    accuracy_factor: float = 10.0,
    use_cache: bool = True,
) -> str:
    """Micro-benchmark each candidate precision ON the actual problem and
    return the fastest one that holds accuracy — the measured counterpart of
    the reference's GPUPrecisionOptimizer (reference
    gpu/gpu_precision.py:421-547, which timed each precision per problem
    shape and cached a strategy).

    Selection rule: a candidate is admissible if its solve converged and
    (when the problem has an exact solution) its L2 error is within
    ``accuracy_factor`` of the best error achieved by any candidate —
    precision must not cost digits the problem could have had. Among
    admissible candidates the min-of-``runs`` wall time decides. Results are
    cached per (problem name, shape, dtype ladder, cfg); pass
    ``use_cache=False`` to re-measure.
    """
    key = (problem.name, problem.grid.nx, problem.grid.ny,
           tuple(candidates), cfg)
    if use_cache and key in _AUTOTUNE_CACHE:
        return _AUTOTUNE_CACHE[key]

    rows = []
    for precision in candidates:
        res = solve_poisson(problem, precision=precision, cfg=cfg)  # compile
        stats = benchmark_function(
            lambda p=precision: solve_poisson(problem, precision=p, cfg=cfg),
            warmup=0, runs=runs)
        rows.append({
            "precision": precision,
            "wall_s": stats["min_s"],
            "converged": res.converged,
            "error_l2": res.errors["l2"] if res.errors else None,
        })

    errs = [r["error_l2"] for r in rows
            if r["converged"] and r["error_l2"] is not None]
    best_err = min(errs) if errs else None
    admissible = [
        r for r in rows
        if r["converged"] and (
            best_err is None or r["error_l2"] is None
            or r["error_l2"] <= accuracy_factor * max(best_err, 1e-300))
    ]
    pool = admissible or [r for r in rows if r["converged"]] or rows
    winner = min(pool, key=lambda r: r["wall_s"])["precision"]
    _AUTOTUNE_CACHE[key] = winner
    return winner
