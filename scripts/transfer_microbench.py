"""Microbenchmark: restriction/prolongation formulations on the real TPU.

Round-1 shipped the 'fused sum + 1x1 stride-2 HIGHEST conv' restriction as the
best of a bad lot; cycle_breakdown.py shows it costs 734 us at 1025^2 -> 513^2
(~50x the BW roofline) and dominates the V-cycle. Hypothesis: every lane-dim
decimation/interleave XLA offers (strided conv / strided slice / reshape)
triggers a catastrophic relayout, while the MXU can do the same data movement
as a matmul against a 0/1 selection matrix at full throughput.

Variants (restriction, full-weighting):
  conv_highest : shipped path (weighted sum + 1x1 stride-2 conv, HIGHEST)
  parity       : parity-plane reshape path (shipped f64/CPU path)
  matmul_y     : sublane reshape decimation in x + W2 @ D matmul in y (HIGHEST)
  matmul_xy    : Dx^T @ W @ Dy both-dim matmul (HIGHEST)
  gather_y     : x via sublane reshape, y via jnp.take along lanes

Prolongation (bilinear):
  repeat_sel   : shipped repeat + parity-select path
  matmul_xy    : Ex @ ec @ Ey interpolation matmuls (HIGHEST)

Usage: python scripts/transfer_microbench.py [--n 1025] [--k 32]
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
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import transfer

HIGH = jax.lax.Precision.HIGHEST


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
    """Iterate fn k times with a true data dependency: the full output feeds
    a scalar that rescales the carry, so neither CSE/LICM nor the relay cache
    can elide iterations. Harness overhead = one sum + one scale per iter
    (~2 BW passes) — measure with the 'baseline_identity' variant and
    subtract."""

    @jax.jit
    def run(x):
        def body(i, carry):
            out = fn(carry)
            s = jnp.sum(out.astype(jnp.float32))
            return carry * (1.0 + 1e-30 * s)
        return jax.lax.fori_loop(0, k, body, x)

    return run


def marginal(make_fn, make_args, k_lo, k_hi, repeats=3):
    t_lo = timed(make_fn(k_lo), make_args, repeats=repeats)
    t_hi = timed(make_fn(k_hi), make_args, repeats=repeats)
    return (t_hi - t_lo) / (k_hi - k_lo)


def weighted_sum(rf):
    """Separable [1 2 1]x[1 2 1]/16 at fine resolution (pure rolls, fast)."""
    row = 2.0 * rf + jnp.roll(rf, 1, 0) + jnp.roll(rf, -1, 0)
    return (2.0 * row + jnp.roll(row, 1, 1) + jnp.roll(row, -1, 1)) / 16.0


def decim_matrix(nfine_p, ncoarse_p, dtype):
    """D (nfine_p x ncoarse_p): D[2j, j] = 1 — lane decimation as matmul."""
    D = np.zeros((nfine_p, ncoarse_p), dtype)
    j = np.arange(ncoarse_p)
    keep = 2 * j < nfine_p
    D[2 * j[keep], j[keep]] = 1.0
    return jnp.asarray(D)


def interp_matrix(ncoarse_p, nfine_p, dtype):
    """E (ncoarse_p x nfine_p): E[j, 2j] = 1, E[j, 2j+-1] = 0.5."""
    E = np.zeros((ncoarse_p, nfine_p), dtype)
    for j in range(ncoarse_p):
        if 2 * j < nfine_p:
            E[j, 2 * j] = 1.0
        if 2 * j + 1 < nfine_p:
            E[j, 2 * j + 1] = 0.5
        if 0 <= 2 * j - 1 < nfine_p:
            E[j, 2 * j - 1] = 0.5
    return jnp.asarray(E)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1025)
    ap.add_argument("--k", type=int, default=32)
    args = ap.parse_args()
    n = args.n
    K_LO, K_HI = args.k, args.k * 9

    gf = Grid(n, n)
    gc = gf.coarsen()
    pxf, pyf = gf.shape_padded
    pxc, pyc = gc.shape_padded
    dtype = jnp.float32

    def mk_fine():
        rng = np.random.default_rng()
        r = np.zeros((pxf, pyf), np.float32)
        r[:n, :n] = rng.standard_normal((n, n))
        return (jnp.asarray(r),)

    def mk_coarse():
        rng = np.random.default_rng()
        r = np.zeros((pxc, pyc), np.float32)
        r[: gc.nx, : gc.ny] = rng.standard_normal((gc.nx, gc.ny))
        return (jnp.asarray(r),)

    Dy = decim_matrix(pyf, pyc, np.float32)
    Dx = decim_matrix(pxf, pxc, np.float32)
    Ey = interp_matrix(pyc, pyf, np.float32)
    Ex = interp_matrix(pxc, pxf, np.float32)

    # ---- restriction variants --------------------------------------------
    def r_conv(rf):
        return transfer.restrict(rf, gc.nx, gc.ny, (pxc, pyc))

    def r_parity(rf):
        return transfer._restrict_interior_parity(rf, gc.nx, gc.ny, dtype,
                                                  full=True)

    def r_matmul_y(rf):
        W = weighted_sum(rf)
        W2 = W.reshape(pxf // 2, 2, pyf)[:, 0, :]      # sublane decimation
        c = jnp.dot(W2, Dy, precision=HIGH)            # lane decimation (MXU)
        return jnp.zeros((pxc, pyc), dtype).at[: pxf // 2, :].set(c)

    def r_matmul_xy(rf):
        W = weighted_sum(rf)
        c = jnp.dot(jnp.dot(Dx.T, W, precision=HIGH), Dy, precision=HIGH)
        return c

    def r_gather_y(rf):
        W = weighted_sum(rf)
        W2 = W.reshape(pxf // 2, 2, pyf)[:, 0, :]
        c = jnp.take(W2, jnp.arange(pyc) * 2, axis=1)
        return c

    # ---- prolongation variants -------------------------------------------
    def p_repeat(ec):
        return transfer.prolong(ec, gc.nx, gc.ny, gf.nx, gf.ny, (pxf, pyf))

    def p_matmul_xy(ec):
        f = jnp.dot(jnp.dot(Ex.T, ec, precision=HIGH), Ey, precision=HIGH)
        return f

    rows = {}
    print(f"# n={n} fine {pxf}x{pyf} coarse {pxc}x{pyc}", flush=True)
    for name, fn, mk in [
        ("baseline_identity", lambda x: x, mk_fine),
        ("r_conv_highest", r_conv, mk_fine),
        ("r_parity", r_parity, mk_fine),
        ("r_matmul_y", r_matmul_y, mk_fine),
        ("r_matmul_xy", r_matmul_xy, mk_fine),
        ("r_gather_y", r_gather_y, mk_fine),
        ("p_repeat_sel", p_repeat, mk_coarse),
        ("p_matmul_xy", p_matmul_xy, mk_coarse),
    ]:
        try:
            t = marginal(lambda k: chain(fn, k), mk, K_LO, K_HI)
            rows[name] = t
            print(f"{name:16s} {t*1e6:9.1f} us", flush=True)
        except Exception as e:
            rows[name] = None
            print(f"{name:16s} FAILED: {str(e).splitlines()[0][:100]}",
                  flush=True)

    # numeric check: matmul variants vs parity ground truth
    rf = mk_fine()[0]
    ref = np.asarray(r_parity(rf))
    for name, fn in [("r_matmul_y", r_matmul_y), ("r_matmul_xy", r_matmul_xy)]:
        got = np.asarray(fn(rf))[: ref.shape[0], : ref.shape[1]]
        # compare interior (parity result is full coarse plane)
        a = got[1 : gc.nx - 1, 1 : gc.ny - 1]
        b = ref[1 : gc.nx - 1, 1 : gc.ny - 1]
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)
        print(f"# {name} max rel err vs parity: {err:.2e}", flush=True)

    ec = mk_coarse()[0]
    refp = np.asarray(p_repeat(ec))
    gotp = np.asarray(p_matmul_xy(ec))
    a = gotp[: gf.nx, : gf.ny]
    b = refp[: gf.nx, : gf.ny]
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)
    print(f"# p_matmul_xy max rel err vs repeat_sel: {err:.2e}", flush=True)

    print(json.dumps({k: (None if v is None else round(v * 1e6, 1))
                      for k, v in rows.items()}))


if __name__ == "__main__":
    main()
