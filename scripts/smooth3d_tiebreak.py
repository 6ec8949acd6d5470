"""Settle the 3D smoothing-kernel contradiction (VERDICT r4 next-round #6).

Round-3 solve-level A/B said the 3D Pallas plane pipeline wins (204 vs 80
MDoF/s at 513^3); the round-4 microbench row said it loses 7.7x at 129^3 —
measured in a degraded-tunnel session with the OLD unguarded protocol
(block_until_ready, which that same session proved unreliable). This script
produces BOTH signals in ONE session with the guarded readback-synced
protocol (scripts/_marginal.py):

  smooth3d_sweep_{n}  : one RB-GS sweep, XLA vs Pallas plane pipeline
                        (guarded two-K marginal)
  solve3d_{n}         : whole mixed-precision ir_solve3d, backend auto vs
                        xla (chained two-K)

SMOOTH3D_AUTO is set from these rows. Writes reports/smooth3d_tiebreak.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid3d import Grid3D  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (  # noqa: E402
    multigrid3d as mg3,
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


def mk_fields(g, dtype=jnp.float32, seed=3):
    def mk():
        rng = np.random.default_rng(seed)
        u = (rng.standard_normal(g.shape_padded) * 0.1).astype(dtype)
        f = (rng.standard_normal(g.shape_padded) * 0.1).astype(dtype)
        return jnp.asarray(u), jnp.asarray(f)
    return mk


def bench_sweep(n, k_lo, results):
    g = Grid3D(n, n, n)
    levels = mg3.build_hierarchy3d(g, dtype=jnp.float32)
    lev = levels[0]
    row = {}
    for backend in ("xla", "pallas"):
        def sweep(u, f, _b=backend, _lev=lev):
            return mg3._smooth3_dispatch(
                _lev, u, f, _lev.unknown, method="rbgs", sweeps=1,
                omega=1.0, sync=None, backend=_b)
        m = robust_marginal(lambda k: chain(sweep, k), mk_fields(g),
                            k_lo=k_lo, dk=k_lo)
        row[backend] = m.to_dict()
        print(f"smooth3d_sweep_{n} {backend:7s} {m.per_iter*1e6:10.1f} us "
              f"(noise {m.noise_floor*1e6:.1f} us, dk={m.dk}"
              f"{'' if m.ok else ', BELOW NOISE FLOOR'})", flush=True)
    results[f"smooth3d_sweep_{n}"] = row


def bench_solve(n, results):
    from mixed_precision_multigrid_solvers_for_pdes_tpu.models import (
        problems3d as P3,
    )

    prob = P3.poisson3d_mms_sinsinsin(n)
    f = jnp.asarray(prob.f, jnp.float64)
    row = {}
    for backend in ("auto", "xla"):
        cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-9,
                              backend=backend, max_iterations=40)
        levels = mg3.build_hierarchy3d(prob.grid, prob.spec,
                                       dtype=jnp.float32, cfg=cfg)
        u, info = mg3.ir_solve3d(levels, f, cfg=cfg)
        assert info["converged"], (backend, info)
        st_hi = levels[0].stencil.astype(jnp.float64)
        u0 = jnp.zeros(levels[0].grid.shape_padded, jnp.float64)

        def solve(uu, ff, _levels=levels, _cfg=cfg, _st=st_hi, _u0=u0):
            out, _ = mg3._ir3_jit(_levels, _st, ff, _u0, _cfg, 2, 40, None)
            return out

        m = robust_marginal(lambda k: chain(solve, k),
                            mk_fields(prob.grid, jnp.float64),
                            k_lo=2, dk=4, max_dk=64)
        row[backend] = dict(m.to_dict(), iterations=info["iterations"])
        dofs = (n - 2) ** 3
        print(f"solve3d_{n} {backend:5s} {m.per_iter*1e3:9.3f} ms/solve "
              f"({dofs / max(m.per_iter, 1e-12) / 1e6:.1f} MDoF/s, "
              f"iters={info['iterations']}"
              f"{'' if m.ok else ', BELOW NOISE FLOOR'})", flush=True)
    results[f"solve3d_{n}"] = row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep-sizes", default="129")
    ap.add_argument("--solve-sizes", default="129,257")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--json", default="reports/smooth3d_tiebreak.json")
    args = ap.parse_args()
    print(f"# backend={jax.default_backend()}", flush=True)
    results = {}
    for n in (int(s) for s in args.sweep_sizes.split(",") if s):
        bench_sweep(n, args.k, results)
    for n in (int(s) for s in args.solve_sizes.split(",") if s):
        bench_solve(n, results)
    Path(args.json).parent.mkdir(parents=True, exist_ok=True)
    Path(args.json).write_text(json.dumps({
        "protocol": "guarded two-K marginal, one session, readback-synced",
        "results": results,
    }, indent=2))
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
