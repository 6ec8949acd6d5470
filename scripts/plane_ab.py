"""Solve-level A/B: HBM-plane-resident level 0 vs the standard auto path.

The decision experiment DESIGN.md/VERDICT r4 asked for: both arms run the
identical IR structure (fp32 V(2,2) inner cycles, f64 outer residual, no
FMG, tol 1e-9 relative) under the batched two-K protocol, same session.
Also rows the plane smoothing kernel against the direct strip kernel
per 2-sweep call.

Writes reports/plane_ab.json. The PLANES_AUTO decision follows these rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import planes as pln  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import stencil as st_mod  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (  # noqa: E402
    smooth as psmooth,
    smooth_planes as psp,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (  # noqa: E402
    plane_solve,
    refinement,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)

from _marginal import robust_marginal  # noqa: E402


def chain(fn, k):
    @jax.jit
    def run(u, f):
        def body(i, u):
            return fn(u, f + 1e-30 * i)
        return jax.lax.fori_loop(0, k, body, u)
    return run


def timed(fn, *args, repeats=4):
    out = fn(*args)
    jax.tree_util.tree_map(jax.device_get, out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(jax.device_get, out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_sweeps(n, results):
    """Per-2-sweep marginal: direct strip kernel vs plane kernel."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid

    g = Grid(n, n)
    st = st_mod.make_stencil(g, dtype=jnp.float32)

    def mk_direct():
        rng = np.random.default_rng(1)
        u = (rng.standard_normal(g.shape_padded) * 0.1).astype(np.float32)
        f = (rng.standard_normal(g.shape_padded) * 0.1).astype(np.float32)
        return jnp.asarray(u), jnp.asarray(f)

    def mk_planes():
        u, f = mk_direct()
        return pln.split_field(u), pln.split_field(f)

    def direct2(u, f):
        return psmooth.multisweep_strips(st, u, f, nx=g.nx, ny=g.ny,
                                         method="rbgs", sweeps=2, omega=1.0)

    def planes2(up, fp):
        return psp.multisweep_planes(st, up, fp, nx=g.nx, ny=g.ny,
                                     sweeps=2, omega=1.0)

    row = {}
    for name, fn, mk in (("direct", direct2, mk_direct),
                         ("planes", planes2, mk_planes)):
        m = robust_marginal(lambda k: chain(fn, k), mk, k_lo=64, dk=64)
        row[name] = m.to_dict()
        print(f"smooth2_{n} {name:7s} {m.per_iter*1e6:9.2f} us "
              f"(noise {m.noise_floor*1e6:.1f}, dk={m.dk}"
              f"{'' if m.ok else ', BELOW NOISE FLOOR'})", flush=True)
    results[f"smooth2_{n}"] = row


def bench_solve(n, results, k_lo=8, dk=24, repeats=4):
    prob = P.poisson_mms_sinsin(n)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-9,
                          backend="auto", max_iterations=40)
    if n >= 2049:
        cfg = cfg.replace(tol=3e-8)  # fp32-correction floor
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32",
                                cfg=cfg)
    f = prob.rhs(jnp.float64)
    u0 = prob.initial_guess(jnp.float64)
    u_s, info_s = refinement.ir_solve(levels, f, u0, cfg, inner_cycles=2,
                                      use_fmg=False)
    u_p, info_p = plane_solve.plane_ir_solve(levels, f, u0, cfg,
                                             inner_cycles=2)
    assert info_s["converged"] and info_p["converged"], (info_s, info_p)
    err = float(jnp.max(jnp.abs(u_p - u_s)))
    print(f"solve_{n}: iters std={info_s['iterations']} "
          f"plane={info_p['iterations']} max|du|={err:.2e}", flush=True)

    st_hi = levels[0].stencil.astype(jnp.float64)

    def solve_std(uu, ff):
        # uu * 1e-300 chains iterations (denormal-scale no-op)
        out, _ = refinement._ir_jit(levels, st_hi, ff + uu * 1e-300, u0,
                                    cfg, 2, 40, False)
        return out

    def solve_planes(uu, ff):
        out, _ = plane_solve._plane_ir_jit(levels, ff + uu * 1e-300, u0,
                                           cfg, 2, 40)
        return out

    def mk():
        rng = np.random.default_rng(2)
        return (jnp.asarray(rng.standard_normal(u0.shape)),
                f + 1e-30 * jnp.asarray(rng.random()))

    row = {"iters_std": info_s["iterations"],
           "iters_plane": info_p["iterations"], "max_du": err}
    for name, fn in (("standard", solve_std), ("planes", solve_planes)):
        m = robust_marginal(lambda k: chain(fn, k), mk, k_lo=k_lo, dk=dk,
                            max_dk=256)
        row[name] = m.to_dict()
        dofs = (n - 2) ** 2
        print(f"solve_{n} {name:9s} {m.per_iter*1e3:9.3f} ms/solve "
              f"({dofs / max(m.per_iter, 1e-12) / 1e6:.1f} MDoF/s"
              f"{'' if m.ok else ', BELOW NOISE FLOOR'})", flush=True)
    results[f"solve_{n}"] = row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep-sizes", default="1025,2049")
    ap.add_argument("--solve-sizes", default="1025,2049")
    ap.add_argument("--json", default="reports/plane_ab.json")
    args = ap.parse_args()
    print(f"# backend={jax.default_backend()}", flush=True)
    results = {}
    for n in (int(s) for s in args.sweep_sizes.split(",") if s):
        bench_sweeps(n, results)
    for n in (int(s) for s in args.solve_sizes.split(",") if s):
        bench_solve(n, results)
    Path(args.json).parent.mkdir(exist_ok=True)
    Path(args.json).write_text(json.dumps({
        "protocol": "guarded two-K marginal, one session; both solve arms "
                    "identical IR structure (no FMG)",
        "results": results,
    }, indent=2))
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
