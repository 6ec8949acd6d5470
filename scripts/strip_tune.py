"""Tune the strip height of the 2D multisweep / fused-transfer kernels.

The strip kernels default to 128-row windows (ops/pallas_kernels/smooth.py,
transfer.py). Each window pays a halo re-read (8 rows both sides) and DMA
issue overhead, so taller strips amortize better until the double-buffered
windows blow the VMEM budget. This measures the marginal per-call cost at
production sizes across strip heights (guarded two-K protocol) and records
the winner; dispatch defaults follow the data.

Usage: python scripts/strip_tune.py [--sizes 1025,2049] [--strips 128,192,256,384]
Writes reports/strip_tune.json.
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

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import stencil as st_mod  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (  # noqa: E402
    smooth as psmooth,
    transfer as ptransfer,
)

from _marginal import robust_marginal  # noqa: E402


def chain(fn, k):
    """Feedback chain that works for shape-changing ops too: the output
    reduces to a scalar that rescales the carry (no-op arithmetically)."""
    @jax.jit
    def run(u, f):
        def body(i, u):
            out = fn(u, f + 1e-30 * i)
            if out.shape == u.shape:
                return out
            s = jnp.sum(out.astype(jnp.float32))
            return u * (1.0 + 1e-30 * s)
        return jax.lax.fori_loop(0, k, body, u)
    return run


def mk_fields(g, seed=3):
    def mk():
        rng = np.random.default_rng(seed)
        u = (rng.standard_normal(g.shape_padded) * 0.1).astype(np.float32)
        f = (rng.standard_normal(g.shape_padded) * 0.1).astype(np.float32)
        return jnp.asarray(u), jnp.asarray(f)
    return mk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1025,2049")
    ap.add_argument("--strips", default="128,192,256,384,512")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--json", default="reports/strip_tune.json")
    args = ap.parse_args()
    results = {}
    for n in (int(s) for s in args.sizes.split(",")):
        g = Grid(n, n)
        st = st_mod.make_stencil(g, dtype=jnp.float32)
        gc = g.coarsen()
        for strip in (int(s) for s in args.strips.split(",")):
            def sweep2(u, f, _strip=strip):
                return psmooth.multisweep_strips(
                    st, u, f, nx=g.nx, ny=g.ny, method="rbgs", sweeps=2,
                    omega=1.0, strip=_strip)

            def rr(u, f, _strip=strip):
                return ptransfer.residual_restrict(
                    st, u, f, nxf=g.nx, nyf=g.ny, ncx=gc.nx, ncy=gc.ny,
                    pshape_coarse=gc.shape_padded, strip=_strip)

            row = {}
            for name, fn in (("smooth2", sweep2), ("rr", rr)):
                try:
                    m = robust_marginal(lambda k: chain(fn, k), mk_fields(g),
                                        k_lo=args.k, dk=args.k)
                    row[name] = m.to_dict()
                    print(f"{n:5d} strip={strip:4d} {name:8s} "
                          f"{m.per_iter*1e6:9.2f} us"
                          f"{'' if m.ok else '  BELOW NOISE FLOOR'}",
                          flush=True)
                except Exception as e:
                    row[name] = str(e)
                    print(f"{n:5d} strip={strip:4d} {name:8s} FAILED "
                          f"{type(e).__name__}: {e}", flush=True)
            results[f"{n}_{strip}"] = row
    Path(args.json).parent.mkdir(exist_ok=True)
    Path(args.json).write_text(json.dumps(results, indent=2))
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
