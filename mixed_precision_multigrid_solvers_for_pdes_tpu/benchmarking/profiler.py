"""Per-stage multigrid profiling with FLOP and bandwidth estimates.

Counterpart of reference benchmarking/performance_profiler.py:41-559
(PerformanceProfiler with FLOPs/bandwidth, MultigridProfiler with per-level
records, bottleneck heuristics, JSON export). Under XLA the per-stage times
cannot be read from inside one fused jit program, so stage timing is measured
by running each stage as its own jitted function with block_until_ready
fences — benchmark-harness style, never inside production solves (those stay
fully fused).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import smooth as smooth_mod, stencil as st_mod, transfer
from ..solvers.multigrid import Level, MultigridConfig
from ..utils.timing import benchmark_function


def _stage_flops_bytes(lev: Level, stage: str, sweeps: int = 1) -> Tuple[float, float]:
    """Rough per-stage FLOP / HBM-byte counts for the 5-point kernels
    (reference performance_profiler.py FLOP models)."""
    n = lev.grid.shape_padded[0] * lev.grid.shape_padded[1]
    itemsize = jnp.dtype(lev.dtype).itemsize
    if stage == "smooth":
        return 10.0 * n * sweeps, 3.0 * n * itemsize * sweeps
    if stage == "residual":
        return 11.0 * n, 3.0 * n * itemsize
    if stage == "restrict":
        return 17.0 * n / 4, (n + n / 4) * itemsize
    if stage == "prolong":
        return 3.0 * n, (n + n / 4) * itemsize
    return 0.0, 0.0


class MultigridProfiler:
    """Profile each multigrid stage per level on real arrays."""

    def __init__(self, levels: Tuple[Level, ...],
                 cfg: MultigridConfig = MultigridConfig()):
        self.levels = levels
        self.cfg = cfg
        self.records: Dict[str, Dict[str, Any]] = {}

    def profile_level(self, lvl: int, *, runs: int = 10) -> Dict[str, Any]:
        lev = self.levels[lvl]
        g = lev.grid
        u = jnp.zeros(g.shape_padded, lev.dtype)
        f = jnp.ones(g.shape_padded, lev.dtype)
        unknown = lev.unknown
        cfg = self.cfg

        smooth_fn = jax.jit(lambda u, f: smooth_mod.smooth(
            lev.stencil, u, f, unknown, method=cfg.smoother,
            sweeps=cfg.pre_sweeps, omega=cfg.omega))
        resid_fn = jax.jit(lambda u, f: st_mod.residual(lev.stencil, u, f, unknown))
        stages: Dict[str, Any] = {
            "smooth": (smooth_fn, (u, f), cfg.pre_sweeps),
            "residual": (resid_fn, (u, f), 1),
        }
        if lvl + 1 < len(self.levels):
            nxt = self.levels[lvl + 1]
            restrict_fn = jax.jit(lambda r: transfer.restrict(
                r, nxt.grid.nx, nxt.grid.ny, nxt.grid.shape_padded,
                method=cfg.restriction, dtype=nxt.dtype))
            ec = jnp.zeros(nxt.grid.shape_padded, nxt.dtype)
            prolong_fn = jax.jit(lambda ec: transfer.prolong(
                ec, nxt.grid.nx, nxt.grid.ny, g.nx, g.ny, g.shape_padded,
                method=cfg.prolongation, dtype=lev.dtype))
            stages["restrict"] = (restrict_fn, (f,), 1)
            stages["prolong"] = (prolong_fn, (ec,), 1)

        rec: Dict[str, Any] = {"n": g.nx, "dtype": str(jnp.dtype(lev.dtype))}
        for name, (fn, args, sweeps) in stages.items():
            stats = benchmark_function(fn, *args, warmup=2, runs=runs)
            flops, bytes_ = _stage_flops_bytes(lev, name, sweeps)
            t = stats["min_s"]
            rec[name] = {
                **stats,
                "gflops": flops / t / 1e9,
                "gbytes_per_s": bytes_ / t / 1e9,
            }
        self.records[f"level_{lvl}"] = rec
        return rec

    def profile_all(self, *, runs: int = 10) -> Dict[str, Any]:
        for lvl in range(len(self.levels)):
            self.profile_level(lvl, runs=runs)
        return self.records

    def bottlenecks(self) -> Dict[str, Any]:
        """Which (level, stage) dominates one cycle's time budget."""
        total = 0.0
        worst = ("", 0.0)
        for key, rec in self.records.items():
            for stage in ("smooth", "residual", "restrict", "prolong"):
                if stage not in rec:
                    continue
                t = rec[stage]["min_s"]
                weight = 2.0 if stage == "smooth" else 1.0  # pre+post
                total += weight * t
                if weight * t > worst[1]:
                    worst = (f"{key}/{stage}", weight * t)
        return {
            "cycle_estimate_s": total,
            "dominant": worst[0],
            "dominant_fraction": worst[1] / max(total, 1e-12),
        }

    def export(self, path) -> None:
        Path(path).write_text(json.dumps(
            {"records": self.records, "bottlenecks": self.bottlenecks()},
            indent=2))
