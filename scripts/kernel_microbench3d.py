"""Microbenchmark: 3D smoothing + fused transfer kernels on the real TPU.

Times the 3D Pallas plane-pipeline kernels (ops/pallas_kernels/smooth3d.py,
transfer3d.py) against the XLA reference paths, with the same two-K marginal
protocol as kernel_microbench.py (the ~27 ms fixed axon dispatch cost
cancels in the K-difference; chained iterations carry a true data
dependency so nothing can be elided).

Rows per size:
  xla_rbgs3d      : solvers/multigrid3d.smooth3d, K sweeps in one jit
  pallas_planes3d : rolling-plane pipeline, K chained single-sweep calls
  xla_transfer3d  : residual -> restrict3d -> prolong3d -> correct, K passes
  pallas_transfer3d : residual_restrict3d + prolong_correct3d, K passes

Usage: python scripts/kernel_microbench3d.py [--sizes 129,257] [--k 16]
Expected (HBM-pass model, v5e ~820 GB/s): the pipeline smoother moves 3
passes/sweep vs XLA's 6; the fused transfer pair ~4.5 passes vs ~7.5+MXU.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid3d import Grid3D
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
    stencil3d as st3,
    transfer3d as t3,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
    smooth3d as ps3,
    transfer3d as pt3,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid3d import (
    smooth3d,
)


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


def marginal(make_fn, make_args, k_lo, k_hi, repeats=3):
    t_lo = timed(make_fn(k_lo), make_args, repeats=repeats)
    t_hi = timed(make_fn(k_hi), make_args, repeats=repeats)
    return (t_hi - t_lo) / (k_hi - k_lo), t_lo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="129,257")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    K_LO, K_HI = args.k, args.k + 64

    results = {}
    for n in [int(s) for s in args.sizes.split(",")]:
        g = Grid3D(n, n, n)
        gc = g.coarsen()
        pshape = g.shape_padded
        st = st3.make_stencil3d(g, dtype=jnp.float32)
        unknown = st3.unknown_mask3d(g)

        def mk():
            rng = np.random.default_rng()
            u = (rng.standard_normal(pshape).astype(np.float32)
                 * np.asarray(unknown))
            f = (rng.standard_normal(pshape).astype(np.float32)
                 * np.asarray(unknown))
            return jnp.asarray(u), jnp.asarray(f)

        def xla_smooth(k):
            @jax.jit
            def run(u, f):
                return smooth3d(st, u, f, unknown, method="rbgs", sweeps=k,
                                omega=1.0)
            return run

        def pallas_smooth(k):
            @jax.jit
            def run(u, f):
                return ps3.rbgs_planes(st, u, f, nx=g.nx, ny=g.ny, nz=g.nz,
                                       sweeps=k, omega=1.0)
            return run

        def xla_transfer(k):
            @jax.jit
            def run(u, f):
                def body(_, u):
                    r = st3.residual(st, u, f, unknown)
                    fc = t3.restrict3d(
                        r, gc.nx, gc.ny, gc.nz, gc.shape_padded,
                        method="full_weighting", boundary="zero",
                        dtype=jnp.float32)
                    e = t3.prolong3d(fc, gc.nx, gc.ny, gc.nz,
                                     g.nx, g.ny, g.nz, pshape,
                                     dtype=jnp.float32)
                    return jnp.where(unknown, u + e, u)
                return jax.lax.fori_loop(0, k, body, u)
            return run

        def pallas_transfer(k):
            @jax.jit
            def run(u, f):
                def body(_, u):
                    fc = pt3.residual_restrict3d(
                        st, u, f, nxf=g.nx, nyf=g.ny, nzf=g.nz,
                        ncx=gc.nx, ncy=gc.ny, ncz=gc.nz,
                        pshape_coarse=gc.shape_padded)
                    return pt3.prolong_correct3d(
                        fc, u, ncx=gc.nx, ncy=gc.ny, ncz=gc.nz,
                        nxf=g.nx, nyf=g.ny, nzf=g.nz)
                return jax.lax.fori_loop(0, k, body, u)
            return run

        py, pz = pshape[1], pshape[2]
        transfer_fits = py * pz * 4 <= pt3.PLANE_BUDGET_BYTES
        rows = {}
        cases = [
            ("xla_rbgs3d", xla_smooth),
            ("pallas_planes3d", pallas_smooth),
            ("xla_transfer3d", xla_transfer),
        ]
        if transfer_fits:
            cases.append(("pallas_transfer3d", pallas_transfer))
        for name, make in cases:
            if only and not any(s in name for s in only):
                continue
            try:
                per, t_lo = marginal(make, mk, K_LO, K_HI)
                rows[name] = per
                print(f"{n:5d}^3  {name:18s} {per*1e6:9.2f} us/pass "
                      f"(t@{K_LO}={t_lo*1e3:7.2f} ms)", flush=True)
            except Exception as e:
                rows[name] = None
                msg = str(e).split(chr(10))[0][:140]
                print(f"{n:5d}^3  {name:18s} FAILED: {msg}", flush=True)
        results[n] = rows

    print(json.dumps({str(k): {kk: (vv if vv is None else round(vv * 1e6, 1))
                               for kk, vv in v.items()}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
