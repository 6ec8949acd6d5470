"""Where does the 5.4 ms/solve at 1025^2 go? Marginal cost of each IR piece.

Components timed with the two-K marginal protocol (tunnel fixed cost
cancels): fp64 residual, fp64 norm, fp32 V(2,2) 'auto' cycle, FMG, and the
full _ir_jit solve (batched K solves in one program).

Usage: python scripts/ir_profile.py [n]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import norms, stencil as st_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import multigrid as mg_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import MultigridConfig
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.refinement import _ir_jit


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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1025
    prob = P.poisson_mms_sinsin(n)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-9,
                          backend="auto", max_iterations=40)
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32", cfg=cfg)
    lev0 = levels[0]
    unknown = lev0.unknown
    hx, hy = lev0.grid.hx, lev0.grid.hy
    st_hi = lev0.stencil.astype(jnp.float64)
    st_lo = lev0.stencil
    pshape = lev0.grid.shape_padded

    def mk64():
        rng = np.random.default_rng()
        u = np.zeros(pshape)
        u[:n, :n] = rng.standard_normal((n, n))
        f = np.zeros(pshape)
        f[:n, :n] = rng.standard_normal((n, n))
        return jnp.asarray(u, jnp.float64), jnp.asarray(f, jnp.float64)

    def mk32():
        u, f = mk64()
        return u.astype(jnp.float32), f.astype(jnp.float32)

    # --- fp64 residual (chained K times) ---
    def resid64_k(k):
        @jax.jit
        def run(u, f):
            def body(i, u):
                r = st_mod.residual(st_hi, u, f, unknown, None)
                return u + 1e-30 * r
            return jax.lax.fori_loop(0, k, body, u)
        return run

    # --- fp64 residual + norm ---
    def residnorm64_k(k):
        @jax.jit
        def run(u, f):
            def body(i, carry):
                u, acc = carry
                r = st_mod.residual(st_hi, u, f, unknown, None)
                return (u + 1e-30 * r, acc + norms.scaled_l2(r, hx, hy))
            return jax.lax.fori_loop(0, k, body, (u, jnp.float64(0)))
        return run

    # --- fp32 residual (for comparison) ---
    def resid32_k(k):
        @jax.jit
        def run(u, f):
            def body(i, u):
                r = st_mod.residual(st_lo, u, f, unknown, None)
                return u + 1e-30 * r
            return jax.lax.fori_loop(0, k, body, u)
        return run

    # --- fp32 V(2,2) cycle 'auto' ---
    def cycle_k(k):
        @jax.jit
        def run(u, f):
            def body(i, u):
                return mg_mod.mg_cycle(levels, u, f + 1e-30 * i, cfg, None)
            return jax.lax.fori_loop(0, k, body, u)
        return run

    # --- FMG ---
    def fmg_k(k):
        @jax.jit
        def run(u, f):
            def body(i, u):
                return u * 1e-30 + mg_mod.fmg(levels, f + 1e-30 * i, cfg)
            return jax.lax.fori_loop(0, k, body, u)
        return run

    # --- full solve (batched) ---
    def solve_k(k):
        @jax.jit
        def run(u, f):
            def body(carry, c):
                uo, packed = _ir_jit(levels, st_hi, f * c, u * 0, cfg,
                                     inner_cycles=2, max_outer=100,
                                     use_fmg=True)
                return carry, packed[:5]
            _, stats = jax.lax.scan(body, 0,
                                    1.0 + jnp.arange(k, dtype=jnp.float64) / 64)
            return stats
        return run

    rows = [
        ("resid64", resid64_k, mk64, 8, 72),
        ("residnorm64", residnorm64_k, mk64, 8, 72),
        ("resid32", resid32_k, mk32, 8, 72),
        ("cycle_auto_f32", cycle_k, mk32, 8, 72),
        ("fmg", fmg_k, mk32, 8, 40),
        ("full_solve", solve_k, mk64, 2, 10),
    ]
    for name, make_fn, mk, klo, khi in rows:
        try:
            per = marginal(make_fn, mk, klo, khi)
            print(f"{name:18s} {per*1e6:10.1f} us", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
