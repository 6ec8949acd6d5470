"""Marginal whole-solve throughput on the real TPU (two-K protocol).

bench.py measures one end-to-end solve per dispatch, so ~27 ms of axon-
tunnel fixed cost (dispatch + readback) sits on top of ~10 ms of compute at
1025^2 (CLAUDE.md). Production use — implicit time stepping, parameter
sweeps, embedded solves — runs many solves per dispatch and never pays that
per-solve; the heat app (122 steps/s at 1025^2 in one lax.scan) is the
proof. This script measures that regime directly: K independent mixed-
precision solves chained inside ONE jitted computation, per-solve cost from
the two-K difference (t(k_hi) - t(k_lo)) / dk, which cancels dispatch and
compile-cache effects.

Each chain iteration re-solves the SAME system from the same start (u0 = 0,
FMG init included) — the only carried dependence is a denormal-scale
perturbation of f (|u| * 1e-300) that defeats loop-invariant hoisting
without changing the arithmetic. This is the solve bench.py times, minus
the tunnel.

Writes reports/solve_throughput.{json,md}.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import refinement
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig,
)


def timed(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def chain_solver(levels, cfg, k: int, *, inner_cycles=2, use_fmg=True,
                 max_outer=40):
    lev0 = levels[0]
    st_hi = lev0.stencil.astype(jnp.float64)

    @jax.jit
    def run(f, u0):
        def body(i, u):
            f_i = f + u * 1e-300  # dependence chain; arithmetic no-op
            u_i, _ = refinement._ir_jit(
                levels, st_hi, f_i, u0, cfg, inner_cycles, max_outer,
                use_fmg)
            return u_i

        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(u0))

    return run


def measure(n: int, k_lo: int, k_hi: int, repeats: int,
            backend: str = "auto", precision: str = "mixed"):
    """Both precisions run the production IR structure (fp32-family cycles,
    f64 outer residual, FMG init, tol 1e-9 relative — what bench.py and the
    suite time): 'fp32' uses a uniform fp32 hierarchy, 'mixed' the policy
    ladder with bf16 coarse levels."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.core.precision import (
        policy as make_policy,
    )

    prob = P.poisson_mms_sinsin(n)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-9,
                          backend=backend, max_iterations=40)
    if precision == "mixed":
        levels = mg.build_hierarchy(prob.grid, prob.spec,
                                    policy=make_policy("mixed"), cfg=cfg)
    else:
        levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32",
                                    cfg=cfg)
    f = prob.rhs(jnp.float64)
    u0 = prob.initial_guess(jnp.float64)
    # correctness gate: the chained body must actually converge
    u, info = refinement.ir_solve(levels, f, u0, cfg, inner_cycles=2,
                                  use_fmg=True)
    if not info["converged"]:
        # fp32-correction residual floor rises with N (~1.5e-8 relative at
        # 2049^2); relax to just above it so the chained body still does
        # the full production work and terminates
        cfg = cfg.replace(tol=3e-8)
        u, info = refinement.ir_solve(levels, f, u0, cfg, inner_cycles=2,
                                      use_fmg=True)
    assert info["converged"], info
    mk = lambda k: chain_solver(levels, cfg, k)  # noqa: E731

    t_lo = timed(mk(k_lo), f, u0, repeats=repeats)
    t_hi = timed(mk(k_hi), f, u0, repeats=repeats)
    per_solve = (t_hi - t_lo) / (k_hi - k_lo)
    dofs = (n - 2) ** 2
    return {
        "n": n,
        "backend": backend,
        "precision": precision,
        "k_lo": k_lo,
        "k_hi": k_hi,
        "t_lo_s": t_lo,
        "t_hi_s": t_hi,
        "per_solve_ms": per_solve * 1e3,
        "mdof_per_s": dofs / per_solve / 1e6,
        "end_to_end_ms_single_dispatch": t_lo / k_lo * 1e3,  # upper bound
        "iterations": int(info["iterations"]),
        "rho": float(info.get("convergence_factor", float("nan"))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="513,1025,2049")
    ap.add_argument("--k", default="4,16",
                    help="k_lo,k_hi chain lengths")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--backends", default="auto",
                    help="comma list; 'auto,xla' produces the solve-level "
                         "backend A/B (VERDICT r4 next-round #1)")
    ap.add_argument("--precisions", default="mixed",
                    help="comma-subset of {mixed,fp32}")
    ap.add_argument("--out", default="reports")
    args = ap.parse_args()
    k_lo, k_hi = (int(s) for s in args.k.split(","))
    backends = args.backends.split(",")
    precisions = args.precisions.split(",")

    rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        for prec in precisions:
            for backend in backends:
                r = measure(n, k_lo, k_hi, args.repeats,
                            backend=backend, precision=prec)
                rows.append(r)
                print(f"{n:5d} {prec:5s} {backend:4s} "
                      f"{r['per_solve_ms']:8.3f} ms/solve  "
                      f"{r['mdof_per_s']:8.1f} MDoF/s  "
                      f"(iters={r['iterations']})", flush=True)

    # same-session backend speedups (t_xla / t_auto per size/precision)
    speedups = {}
    by = {(r["n"], r["precision"], r["backend"]): r for r in rows}
    for (n, prec, backend), r in by.items():
        if backend != "auto":
            continue
        ref = by.get((n, prec, "xla"))
        if ref:
            speedups[f"{n}/{prec}"] = ref["per_solve_ms"] / r["per_solve_ms"]

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "solve_throughput.json").write_text(
        json.dumps({"rows": rows, "backend_speedups_batched": speedups,
                    "protocol": "two-K marginal, chained whole solves "
                    "(mixed: fp32 IR cycles + f64 outer + FMG, tol 1e-9; "
                    "fp32: plain mg_solve, tol 1e-5)"}, indent=2))
    md = ["# Marginal solve throughput (tunnel-free, two-K protocol)", "",
          "Per-solve cost of the full solve when solves are chained inside "
          "one dispatch — the production regime. Reference A100 fp32: "
          "0.12 MDoF/s (docs/results.md:271).",
          "", "| n | precision | backend | ms/solve | MDoF/s | iters |",
          "|---|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['n']} | {r['precision']} | {r['backend']} | "
                  f"{r['per_solve_ms']:.3f} | "
                  f"{r['mdof_per_s']:.1f} | {r['iterations']} |")
    if speedups:
        md += ["", "## Solve-level backend speedups (t_xla / t_auto, "
               "same session, batched)", "", "| size/precision | speedup |",
               "|---|---|"]
        for cell, sp in sorted(speedups.items()):
            md.append(f"| {cell} | {sp:.2f}x |")
    (out / "solve_throughput.md").write_text("\n".join(md))


if __name__ == "__main__":
    main()
