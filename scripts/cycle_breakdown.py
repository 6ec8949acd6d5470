"""Marginal-cost breakdown of one multigrid V-cycle on the real TPU.

Times, via the two-K difference protocol (see kernel_microbench.py):
- the full V(2,2) cycle at n^2,
- cycles over truncated hierarchies (max_levels = 1..L) -> incremental cost
  of each added level,
- the individual fine-level stages (smooth / residual / restrict / prolong).

This is the evidence base for deciding which stages get Pallas kernels
(VERDICT.md next-round #1/#4).

Usage: python scripts/cycle_breakdown.py [--n 1025] [--k 16]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
    stencil as st_mod, transfer)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
    multigrid as mg_mod)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig)


def timed(fn, make_args, *, repeats=3):
    out = fn(*make_args())
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        args = make_args()
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def chain(fn, k):
    """fn(u, f) -> u, iterated k times with an input perturbation so the
    relay can't cache and XLA can't CSE the iterations."""

    @jax.jit
    def run(u, f):
        def body(i, u):
            return fn(u, f + 1e-30 * i)
        return jax.lax.fori_loop(0, k, body, u)

    return run


def marginal(make_fn, make_args, k_lo, k_hi, repeats=3):
    t_lo = timed(make_fn(k_lo), make_args, repeats=repeats)
    t_hi = timed(make_fn(k_hi), make_args, repeats=repeats)
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1025)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    n = args.n
    dtype = jnp.dtype(args.dtype)

    g = Grid(n, n)
    pshape = g.shape_padded
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, cycle="V",
                          pre_sweeps=2, post_sweeps=2)
    levels_full = mg_mod.build_hierarchy(g, dtype=dtype, cfg=cfg)
    L = len(levels_full)
    print(f"# n={n} dtype={dtype.name} levels={L} pshape={pshape}", flush=True)

    def mk():
        rng = np.random.default_rng()
        u = np.zeros(pshape, dtype)
        f = np.zeros(pshape, dtype)
        u[:n, :n] = rng.standard_normal((n, n))
        f[:n, :n] = rng.standard_normal((n, n))
        return jnp.asarray(u), jnp.asarray(f)

    K_LO, K_HI = args.k, args.k * 9
    rows = {}

    # full cycle + truncated hierarchies
    prev = 0.0
    for depth in range(1, L + 1):
        levels = levels_full[:depth]

        def cyc(u, f, levels=levels):
            if len(levels) == 1:
                # coarsest-only would smooth 32x; instead time the smoother
                return mg_mod._smooth(levels[0], u, f, cfg, 4)
            return mg_mod.mg_cycle(levels, u, f, cfg)

        t = marginal(lambda k: chain(cyc, k), mk, K_LO, K_HI)
        rows[f"cycle_depth_{depth}"] = t
        print(f"depth {depth:2d} ({levels[-1].grid.nx:5d}^2 coarsest): "
              f"{t*1e6:8.1f} us/cycle  (+{(t-prev)*1e6:7.1f})", flush=True)
        prev = t

    # fine-level stages
    lev0 = levels_full[0]
    lev1 = levels_full[1]
    unknown = lev0.unknown

    def stage_smooth(u, f):
        return mg_mod._smooth(lev0, u, f, cfg, 2)

    def stage_resid(u, f):
        return st_mod.residual(lev0.stencil, u, f, unknown)

    def stage_restrict(u, f):
        r = st_mod.residual(lev0.stencil, u, f, unknown)
        return transfer.restrict(r, lev1.grid.nx, lev1.grid.ny,
                                 lev1.grid.shape_padded, dtype=lev1.dtype)

    def stage_prolong(u, f):
        # u here stands in for a coarse array padded into the fine buffer;
        # build a real coarse-shaped input instead
        ec = u[: lev1.grid.shape_padded[0], : lev1.grid.shape_padded[1]]
        e = transfer.prolong(ec, lev1.grid.nx, lev1.grid.ny,
                             lev0.grid.nx, lev0.grid.ny,
                             lev0.grid.shape_padded, dtype=lev0.dtype)
        return jnp.where(unknown, e + 0.0 * f, e)

    for name, fn in [("smooth2", stage_smooth), ("residual", stage_resid),
                     ("resid+restrict", stage_restrict),
                     ("prolong+mask", stage_prolong)]:
        def wrap(u, f, fn=fn):
            out = fn(u, f)
            # keep output shape == u shape for chaining
            if out.shape != u.shape:
                out = jnp.zeros_like(u).at[: out.shape[0], : out.shape[1]].add(
                    out)
            return out

        t = marginal(lambda k: chain(wrap, k), mk, K_LO * 4, K_HI * 4)
        rows[f"stage_{name}"] = t
        print(f"stage {name:15s}: {t*1e6:8.1f} us", flush=True)

    print(json.dumps({k: round(v * 1e6, 1) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
