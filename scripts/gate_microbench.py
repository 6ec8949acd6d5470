"""Microbenchmark for the 2D hardware-gated Pallas kernels.

`ops/dispatch.py` keeps two 2D 'auto' gates off until their kernels have been
Mosaic-compiled and TIMED on the real chip (interpret-mode tests pin numerics
only):

  VARCOEF_AUTO — variable-coefficient multisweep smoothing (coefficient
                 planes streamed through VMEM windows)
  TAIL_AUTO    — the fused coarse-tail kernel (whole V-recursion below the
                 entry level in ONE kernel launch, ops/pallas_kernels/tail.py)

This script produces the numbers that justify (or veto) flipping each gate:
marginal cost per operation with the two-K protocol (chained iterations with
a real data dependency; the ~27 ms fixed axon dispatch cost cancels in the
K-difference — see scripts/kernel_microbench.py).

Rows:
  varcoef_sweep_{n}  : one variable-coefficient RB-GS sweep, XLA vs Pallas
  tail_cycle_{n}     : one V(2,2) cycle from entry n^2 to the coarsest level,
                       XLA recursion (~6 ops/level) vs single fused kernel
  tailvar_cycle_{n}  : same, variable-coefficient hierarchy (tail_vcycle_var
                       with VMEM-resident coefficient planes; TAILVAR_AUTO)
  full_cycle_{n}     : one V(2,2) cycle at a production size whose coarse
                       tail the kernel would absorb (auto routing vs
                       backend='pallas' end to end)

Usage: python scripts/gate_microbench.py
         [--varcoef-sizes 513,1025] [--tail-sizes 65,129]
         [--full-sizes 1025] [--k 64] [--json reports/gate_microbench.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import dispatch
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
    multigrid as mg_mod,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig,
)


from _marginal import robust_marginal  # noqa: E402  (same directory)


def chain(fn, k):
    @jax.jit
    def run(u, f):
        def body(i, u):
            # denormal-scale perturbation defeats loop-invariant hoisting
            # without changing the arithmetic
            return fn(u, f + 1e-30 * i)
        return jax.lax.fori_loop(0, k, body, u)
    return run


def marginal(fn, make_args, k_lo, dk):
    """Guarded two-K marginal (scripts/_marginal.py): median-of-5 repeats,
    K spread auto-widened past the measured noise floor, never returns a
    negative value without flagging it (round-3 shipped -4..-130 us rows;
    VERDICT.md r3 weak #2)."""
    return robust_marginal(lambda k: chain(fn, k), make_args,
                           k_lo=k_lo, dk=dk)


def _mk_fields(pshape, n):
    def mk():
        rng = np.random.default_rng()
        u = np.zeros(pshape, np.float32)
        f = np.zeros(pshape, np.float32)
        u[:n, :n] = rng.standard_normal((n, n)).astype(np.float32)
        f[:n, :n] = rng.standard_normal((n, n)).astype(np.float32)
        return jnp.asarray(u), jnp.asarray(f)
    return mk


def _varcoef_levels(n, cfg):
    g = Grid(n, n)
    px, py = g.shape_padded
    X, Y = np.meshgrid(np.linspace(0, 1, px), np.linspace(0, 1, py),
                       indexing="ij")
    a = (1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(np.pi * Y)).astype(
        np.float32)
    return mg_mod.build_hierarchy(g, a=jnp.asarray(a), dtype=jnp.float32,
                                  cfg=cfg)


def bench_varcoef(sizes, k, results):
    for n in sizes:
        cfg = MultigridConfig(smoother="rbgs", omega=1.0)
        levels = _varcoef_levels(n, cfg)
        lev = levels[0]
        row = {}
        for backend in ("xla", "pallas"):
            def sweep(u, f, _b=backend, _lev=lev):
                return dispatch.smooth(_lev.stencil, u, f, _lev,
                                       method="rbgs", sweeps=1, omega=1.0,
                                       backend=_b)
            try:
                m = marginal(sweep, _mk_fields(lev.grid.shape_padded, n),
                             k, 64)
                row[backend] = m.to_dict()
                print(f"varcoef_sweep_{n} {backend:7s} "
                      f"{m.per_iter*1e6:9.2f} us  (noise "
                      f"{m.noise_floor*1e6:.1f} us, dk={m.dk}"
                      f"{'' if m.ok else ', BELOW NOISE FLOOR'})",
                      flush=True)
            except Exception as e:
                row[backend] = None
                print(f"varcoef_sweep_{n} {backend:7s} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        results[f"varcoef_sweep_{n}"] = row


def bench_varxfer(sizes, k, results):
    """Variable-coefficient fused residual_restrict + prolong_correct pair
    vs the XLA transfer chain (ADVICE r4 medium: VARCOEF_AUTO also routes
    the varcoef fused transfers at >=4 MB, but only smoothing rows were ever
    measured — these rows close that gap)."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
        stencil as st_mod,
        transfer,
    )

    for n in sizes:
        cfg = MultigridConfig(smoother="rbgs", omega=1.0)
        levels = _varcoef_levels(n, cfg)
        lev, nxt = levels[0], levels[1]
        row = {}

        def pair_xla(u, f, _lev=lev, _nxt=nxt):
            r = st_mod.residual(_lev.stencil, u, f, _lev.unknown, None)
            fc = transfer.restrict(
                r, _nxt.grid.nx, _nxt.grid.ny, _nxt.grid.shape_padded,
                method="full_weighting", boundary="zero", dtype=_nxt.dtype)
            e = transfer.prolong(
                fc, _nxt.grid.nx, _nxt.grid.ny, _lev.grid.nx, _lev.grid.ny,
                _lev.grid.shape_padded, method="bilinear", dtype=_lev.dtype)
            return jnp.where(_lev.unknown, u + e, u)

        def pair_pallas(u, f, _lev=lev, _nxt=nxt):
            fc = dispatch.residual_restrict(_lev, _nxt, u, f)
            return dispatch.prolong_correct(_lev, _nxt, fc, u)

        pcfg = MultigridConfig(smoother="rbgs", omega=1.0, backend="pallas")
        assert dispatch.transfer_fused_ok(lev, nxt, pcfg), \
            f"varcoef transfer gate rejects {n}"
        for backend, fn in (("xla", pair_xla), ("pallas", pair_pallas)):
            try:
                m = marginal(fn, _mk_fields(lev.grid.shape_padded, n), k, 64)
                row[backend] = m.to_dict()
                print(f"varxfer_pair_{n} {backend:7s} "
                      f"{m.per_iter*1e6:9.2f} us  (noise "
                      f"{m.noise_floor*1e6:.1f} us, dk={m.dk}"
                      f"{'' if m.ok else ', BELOW NOISE FLOOR'})",
                      flush=True)
            except Exception as e:
                row[backend] = None
                print(f"varxfer_pair_{n} {backend:7s} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        results[f"varxfer_pair_{n}"] = row


def bench_tail(sizes, k, results):
    for n in sizes:
        g = Grid(n, n)
        row = {}
        for backend in ("xla", "pallas"):
            cfg = MultigridConfig(smoother="rbgs", omega=1.0,
                                  backend=backend)
            levels = mg_mod.build_hierarchy(g, dtype=jnp.float32, cfg=cfg)
            if backend == "pallas":
                assert dispatch.tail_ok(levels, 0, cfg, "V"), \
                    f"tail gate rejects entry {n}"

            def cyc(u, f, _cfg=cfg, _levels=levels):
                return mg_mod.mg_cycle(_levels, u, f, _cfg)
            try:
                m = marginal(cyc, _mk_fields(g.shape_padded, n), k, 64)
                row[backend] = m.to_dict()
                print(f"tail_cycle_{n}   {backend:7s} "
                      f"{m.per_iter*1e6:9.2f} us  (noise "
                      f"{m.noise_floor*1e6:.1f} us, dk={m.dk}"
                      f"{'' if m.ok else ', BELOW NOISE FLOOR'})",
                      flush=True)
            except Exception as e:
                row[backend] = None
                print(f"tail_cycle_{n}   {backend:7s} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        results[f"tail_cycle_{n}"] = row


def bench_tailvar(sizes, k, results):
    """Variable-coefficient fused tail (tail_vcycle_var) vs the XLA coarse
    recursion — the TAILVAR_AUTO gate data (round-3 VERDICT item 3)."""
    for n in sizes:
        row = {}
        for backend in ("xla", "pallas"):
            cfg = MultigridConfig(smoother="rbgs", omega=1.0,
                                  backend=backend)
            levels = _varcoef_levels(n, cfg)
            if backend == "pallas":
                assert dispatch.tail_ok(levels, 0, cfg, "V"), \
                    f"varcoef tail gate rejects entry {n}"

            def cyc(u, f, _cfg=cfg, _levels=levels):
                return mg_mod.mg_cycle(_levels, u, f, _cfg)
            try:
                m = marginal(cyc, _mk_fields(levels[0].grid.shape_padded, n),
                             k, 64)
                row[backend] = m.to_dict()
                print(f"tailvar_cycle_{n} {backend:7s} "
                      f"{m.per_iter*1e6:9.2f} us  (noise "
                      f"{m.noise_floor*1e6:.1f} us, dk={m.dk}"
                      f"{'' if m.ok else ', BELOW NOISE FLOOR'})",
                      flush=True)
            except Exception as e:
                row[backend] = None
                print(f"tailvar_cycle_{n} {backend:7s} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        results[f"tailvar_cycle_{n}"] = row


def bench_tail3d(sizes, k, results):
    """3D coarse-recursion cost from a small cube entry (round-3 VERDICT
    item 9): the two-K marginal of a full XLA V(2,2) cycle at 33^3/65^3
    entries measures what a fused 3D tail kernel could absorb per 257^3/
    513^3 cycle. 'pallas' here means the shipped 'auto' routing (3D plane
    kernels gate in above 64 KB; these levels are below it), so the row
    pair bounds the opportunity; a win would justify building tail3d."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid3d import (
        Grid3D,
    )
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
        multigrid3d as mg3,
    )

    for n in sizes:
        g = Grid3D(n, n, n)
        row = {}
        for backend in ("xla", "auto"):
            cfg = MultigridConfig(smoother="rbgs", omega=1.0,
                                  backend=backend)
            levels = mg3.build_hierarchy3d(g, dtype=jnp.float32, cfg=cfg)

            def mk(pshape=g.shape_padded):
                rng = np.random.default_rng()
                u = np.zeros(pshape, np.float32)
                f = np.zeros(pshape, np.float32)
                u[:n, :n, :n] = 1e-3 * rng.standard_normal((n, n, n))
                f[:n, :n, :n] = rng.standard_normal((n, n, n))
                return jnp.asarray(u), jnp.asarray(f)

            def cyc(u, f, _cfg=cfg, _levels=levels):
                return mg3.mg_cycle3d(_levels, u, f, _cfg)
            try:
                m = marginal(cyc, mk, k, 64)
                row[backend] = m.to_dict()
                print(f"tail3d_cycle_{n} {backend:7s} "
                      f"{m.per_iter*1e6:9.2f} us  (noise "
                      f"{m.noise_floor*1e6:.1f} us, dk={m.dk}"
                      f"{'' if m.ok else ', BELOW NOISE FLOOR'})",
                      flush=True)
            except Exception as e:
                row[backend] = None
                print(f"tail3d_cycle_{n} {backend:7s} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        results[f"tail3d_cycle_{n}"] = row


def bench_full(sizes, k, results):
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels \
        import smooth as psmooth

    for n in sizes:
        g = Grid(n, n)
        row = {}
        # 'auto_parity' A/Bs the in-kernel parity-plane sweep layout against
        # the shipped direct layout at the full-cycle level (PARITY_DEFAULT
        # documentation in ops/pallas_kernels/smooth.py)
        for variant, backend in (("auto", "auto"), ("pallas", "pallas"),
                                 ("auto_parity", "auto")):
            cfg = MultigridConfig(smoother="rbgs", omega=1.0,
                                  backend=backend)
            levels = mg_mod.build_hierarchy(g, dtype=jnp.float32, cfg=cfg)
            parity_saved = psmooth.PARITY_DEFAULT
            psmooth.PARITY_DEFAULT = variant == "auto_parity"
            jax.clear_caches()

            def cyc(u, f, _cfg=cfg, _levels=levels):
                return mg_mod.mg_cycle(_levels, u, f, _cfg)
            try:
                m = marginal(cyc, _mk_fields(g.shape_padded, n), k, 64)
                row[variant] = m.to_dict()
                print(f"full_cycle_{n}   {variant:12s} "
                      f"{m.per_iter*1e6:9.2f} us  (noise "
                      f"{m.noise_floor*1e6:.1f} us, dk={m.dk}"
                      f"{'' if m.ok else ', BELOW NOISE FLOOR'})",
                      flush=True)
            except Exception as e:
                row[variant] = None
                print(f"full_cycle_{n}   {variant:12s} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
            finally:
                psmooth.PARITY_DEFAULT = parity_saved
        results[f"full_cycle_{n}"] = row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--varcoef-sizes", default="513,1025")
    ap.add_argument("--tail-sizes", default="65,129")
    ap.add_argument("--tail3d-sizes", default="33,65")
    ap.add_argument("--full-sizes", default="1025")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--json", default="")
    ap.add_argument("--only", default="",
                    help="comma-subset of {varcoef,varxfer,tail,tailvar,tail3d,full}")
    args = ap.parse_args()
    only = set(s for s in args.only.split(",") if s) or {
        "varcoef", "varxfer", "tail", "tailvar", "tail3d", "full"}

    print(f"# backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    results = {}
    if "varcoef" in only:
        bench_varcoef([int(s) for s in args.varcoef_sizes.split(",")],
                      args.k, results)
    if "varxfer" in only:
        bench_varxfer([int(s) for s in args.varcoef_sizes.split(",")],
                      args.k, results)
    if "tail" in only:
        bench_tail([int(s) for s in args.tail_sizes.split(",")],
                   args.k, results)
    if "tailvar" in only:
        bench_tailvar([int(s) for s in args.tail_sizes.split(",")],
                      args.k, results)
    if "tail3d" in only:
        bench_tail3d([int(s) for s in args.tail3d_sizes.split(",") if s],
                     args.k, results)
    if "full" in only:
        bench_full([int(s) for s in args.full_sizes.split(",")],
                   args.k, results)
    from _marginal import check_rows

    bad = check_rows(results)
    for b in bad:
        print(f"# WARNING: {b} did not clear the noise floor", flush=True)
    if args.json:
        payload = {
            "protocol": "guarded two-K marginal (scripts/_marginal.py): "
                        "median of 5 repeats, MAD noise floor, K spread "
                        "auto-widened to >=4x the floor; rows that never "
                        "cleared the floor carry ok=false",
            "rows_below_noise_floor": bad,
            "results": results,
        }
        Path(args.json).write_text(json.dumps(payload, indent=2))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
