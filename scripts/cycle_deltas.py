"""Decompose the real depth-2 V-cycle cost by config deltas (no harness
artifacts: each measurement is the actual mg_cycle, differing in ONE config
knob). Explains where cycle_breakdown.py's +1.3 ms depth-1 -> depth-2 jump
goes.

Usage: python scripts/cycle_deltas.py [--n 1025]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
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
    @jax.jit
    def run(u, f):
        def body(i, u):
            return fn(u, f + 1e-30 * i)
        return jax.lax.fori_loop(0, k, body, u)
    return run


def marginal(make_fn, make_args, k_lo=16, k_hi=144, repeats=3):
    t_lo = timed(make_fn(k_lo), make_args, repeats=repeats)
    t_hi = timed(make_fn(k_hi), make_args, repeats=repeats)
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1025)
    ap.add_argument("--depth", type=int, default=2,
                    help="hierarchy depth (0 = full)")
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()
    n = args.n
    g = Grid(n, n)
    pshape = g.shape_padded

    def mk():
        rng = np.random.default_rng()
        u = np.zeros(pshape, np.float32)
        f = np.zeros(pshape, np.float32)
        u[:n, :n] = rng.standard_normal((n, n))
        f[:n, :n] = rng.standard_normal((n, n))
        return jnp.asarray(u), jnp.asarray(f)

    base = MultigridConfig(smoother="rbgs", omega=1.0, cycle="V",
                           backend=args.backend)
    levels = mg_mod.build_hierarchy(g, dtype=jnp.float32, cfg=base)
    if args.depth:
        levels = levels[: args.depth]
    print(f"# n={n} depth={len(levels)} backend={args.backend}", flush=True)

    configs = [
        ("A: pre0 post0 coarse0", base.replace(pre_sweeps=0, post_sweeps=0,
                                               coarse_sweeps=0)),
        ("B: pre2 post2 coarse0", base.replace(coarse_sweeps=0)),
        ("C: pre2 post2 coarse8", base.replace(coarse_sweeps=8)),
        ("D: pre2 post2 coarse32", base.replace(coarse_sweeps=32)),
    ]
    prev = None
    for name, cfg in configs:
        def cyc(u, f, cfg=cfg):
            return mg_mod.mg_cycle(levels, u, f, cfg)

        t = marginal(lambda k: chain(cyc, k), mk)
        delta = "" if prev is None else f"  (+{(t-prev)*1e6:7.1f})"
        print(f"{name:24s} {t*1e6:8.1f} us{delta}", flush=True)
        prev = t


if __name__ == "__main__":
    main()
