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


def measure(n: int, k_lo: int, k_hi: int, repeats: int):
    prob = P.poisson_mms_sinsin(n)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-9,
                          backend="auto", max_iterations=40)
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32",
                                cfg=cfg)
    f = prob.rhs(jnp.float64)
    u0 = prob.initial_guess(jnp.float64)

    # correctness gate: the chained body must actually converge
    u, info = refinement.ir_solve(levels, f, u0, cfg, inner_cycles=2,
                                  use_fmg=True)
    assert info["converged"], info

    t_lo = timed(chain_solver(levels, cfg, k_lo), f, u0, repeats=repeats)
    t_hi = timed(chain_solver(levels, cfg, k_hi), f, u0, repeats=repeats)
    per_solve = (t_hi - t_lo) / (k_hi - k_lo)
    dofs = (n - 2) ** 2
    return {
        "n": n,
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
    ap.add_argument("--out", default="reports")
    args = ap.parse_args()
    k_lo, k_hi = (int(s) for s in args.k.split(","))

    rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        r = measure(n, k_lo, k_hi, args.repeats)
        rows.append(r)
        print(f"{n:5d}  {r['per_solve_ms']:8.3f} ms/solve  "
              f"{r['mdof_per_s']:8.1f} MDoF/s  (iters={r['iterations']})",
              flush=True)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "solve_throughput.json").write_text(
        json.dumps({"rows": rows, "protocol": "two-K marginal, chained "
                    "mixed-precision ir_solve (fp32 cycles, f64 outer, FMG "
                    "init, tol 1e-9 relative)"}, indent=2))
    md = ["# Marginal solve throughput (tunnel-free, two-K protocol)", "",
          "Per-solve cost of the full mixed-precision solve (FMG init + "
          "fp32 V(2,2) IR cycles + f64 outer residuals, tol 1e-9 relative) "
          "when solves are chained inside one dispatch — the production "
          "regime. Reference A100 fp32: 0.12 MDoF/s (docs/results.md:271).",
          "", "| n | ms/solve | MDoF/s | iters |", "|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['n']} | {r['per_solve_ms']:.3f} | "
                  f"{r['mdof_per_s']:.1f} | {r['iterations']} |")
    (out / "solve_throughput.md").write_text("\n".join(md))


if __name__ == "__main__":
    main()
