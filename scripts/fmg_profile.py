"""Bisect FMG cost at 1025^2: restrict chain, prolong chain, per-level cycles.

Usage: python scripts/fmg_profile.py [n]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import transfer
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import multigrid as mg_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig, _cycle,
)


def timed(fn, make_args, repeats=3):
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


def marginal(make_fn, make_args, k_lo, k_hi, repeats=3):
    t_lo = timed(make_fn(k_lo), make_args, repeats)
    t_hi = timed(make_fn(k_hi), make_args, repeats)
    return (t_hi - t_lo) / (k_hi - k_lo)


def chain(fn, k):
    @jax.jit
    def run(u, f):
        def body(i, u):
            return fn(u, f + 1e-30 * i)
        return jax.lax.fori_loop(0, k, body, u)
    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1025
    prob = P.poisson_mms_sinsin(n)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-9,
                          backend="auto", max_iterations=40)
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32", cfg=cfg)
    pshape = levels[0].grid.shape_padded
    print(f"# levels: {[lev.grid.nx for lev in levels]}")

    def mk(shape=pshape, nn=n):
        def go():
            rng = np.random.default_rng()
            u = np.zeros(shape, np.float32)
            f = np.zeros(shape, np.float32)
            u[:nn, :nn] = rng.standard_normal((nn, nn)).astype(np.float32)
            f[:nn, :nn] = rng.standard_normal((nn, nn)).astype(np.float32)
            return jnp.asarray(u), jnp.asarray(f)
        return go

    # restrict chain (as in fmg)
    def restrict_chain(u, f):
        rhs = f
        acc = u[0, 0] * 0
        for lvl in range(len(levels) - 1):
            nxt = levels[lvl + 1]
            rhs = transfer.restrict(
                rhs, nxt.grid.nx, nxt.grid.ny, nxt.grid.shape_padded,
                method=cfg.restriction, boundary="inject", dtype=nxt.dtype)
            acc = acc + rhs[0, 0]
        return u + acc

    # prolong chain only (no cycles)
    def prolong_chain(u, f):
        v = jnp.zeros(levels[-1].grid.shape_padded, jnp.float32) + f[0, 0]
        for lvl in range(len(levels) - 2, -1, -1):
            lev = levels[lvl]
            v = transfer.prolong(
                v, levels[lvl + 1].grid.nx, levels[lvl + 1].grid.ny,
                lev.grid.nx, lev.grid.ny, lev.grid.shape_padded,
                method=cfg.prolongation, dtype=lev.dtype)
        return u + v

    rows = [("restrict_chain", restrict_chain), ("prolong_chain", prolong_chain)]

    # cycle from each level (on that level's shapes)
    for lvl in range(len(levels) - 1, -1, -1):
        lev = levels[lvl]
        nn = lev.grid.nx
        shape = lev.grid.shape_padded

        def cyc(u, f, _lvl=lvl):
            return _cycle(levels, u, f, _lvl, cfg, "V", None)

        per = marginal(lambda k, _f=cyc: chain(_f, k), mk(shape, nn), 8, 72)
        print(f"cycle_from_L{lvl}({nn:4d})  {per*1e6:9.1f} us", flush=True)

    for name, fn in rows:
        per = marginal(lambda k, _f=fn: chain(_f, k), mk(), 8, 72)
        print(f"{name:18s} {per*1e6:9.1f} us", flush=True)

    def fmg_fn(u, f):
        return u * 1e-30 + mg_mod.fmg(levels, f, cfg)

    per = marginal(lambda k: chain(fmg_fn, k), mk(), 8, 40)
    print(f"{'fmg_total':18s} {per*1e6:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
