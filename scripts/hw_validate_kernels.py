"""Hardware validation battery: compile + numerics-check every Pallas kernel
against its XLA reference ON THE REAL TPU (Mosaic compile, not interpreter).

The interpreter tests (tests/unit/test_pallas_kernels.py) pin numerics on
CPU; Mosaic has its own lowering rules (int32 index math, DMA alignment,
reshape legality), so each kernel must also be proven on-device before its
'auto' routing gate flips (ops/dispatch.py: VARCOEF_AUTO, TAIL_AUTO,
SMOOTH3D_AUTO, TRANSFER3D_AUTO).

Usage: python scripts/hw_validate_kernels.py [--only substr[,substr]]
Prints one PASS/FAIL line per case and a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_enable_x64", True)

from mixed_precision_multigrid_solvers_for_pdes_tpu.core import bc as bc_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid3d import Grid3D
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
    smooth as smooth_mod,
    stencil as st_mod,
    stencil3d as st3,
    transfer as transfer_mod,
    transfer3d as t3,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
    smooth as psmooth,
    smooth3d as ps3,
    tail as ptail,
    transfer as ptransfer,
    transfer3d as pt3,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
    multigrid as mg_mod,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid3d import (
    smooth3d,
)


def _problem2d(n, dtype=jnp.float32, varcoef=False, seed=3):
    g = Grid(n, n)
    if varcoef:
        X, Y = np.meshgrid(np.linspace(0, 1, g.shape_padded[0]),
                           np.linspace(0, 1, g.shape_padded[1]),
                           indexing="ij")
        a = 1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(np.pi * Y)
        a = np.where(X > 0.5, 10.0 * a, a).astype(np.float32)
        st = st_mod.make_stencil(g, a=jnp.asarray(a), dtype=dtype)
    else:
        st = st_mod.make_stencil(g, dtype=dtype)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    rng = np.random.default_rng(seed)
    f = jnp.asarray((rng.standard_normal(g.shape_padded)
                     * np.asarray(unknown)).astype(dtype))
    u = jnp.asarray((rng.standard_normal(g.shape_padded)
                     * np.asarray(unknown)).astype(dtype))
    return g, st, unknown, f, u


def _problem3d(shape, dtype=jnp.float32, seed=5):
    g = Grid3D(*shape)
    st = st3.make_stencil3d(g, dtype=dtype)
    unknown = st3.unknown_mask3d(g)
    rng = np.random.default_rng(seed)
    f = jnp.asarray((rng.standard_normal(g.shape_padded)
                     * np.asarray(unknown)).astype(dtype))
    u = jnp.asarray((rng.standard_normal(g.shape_padded)
                     * np.asarray(unknown)).astype(dtype))
    return g, st, unknown, f, u


def _check(name, got, ref, tol):
    got = np.asarray(jax.device_get(got), np.float64)
    ref = np.asarray(jax.device_get(ref), np.float64)
    scale = max(np.max(np.abs(ref)), 1e-30)
    err = np.max(np.abs(got - ref)) / scale
    ok = bool(err <= tol)
    print(f"{'PASS' if ok else 'FAIL'}  {name:42s} rel-err {err:.2e}",
          flush=True)
    return ok, float(err)


def cases():
    # ---- 2D var-coef smoothing (whole-grid + strips) ----
    def varcoef_whole():
        g, st, unknown, f, u = _problem2d(129, varcoef=True)
        ref = smooth_mod.smooth(st, u, f, unknown, method="rbgs", sweeps=2,
                                omega=1.0)
        got = psmooth.multisweep(st, u, f, nx=g.nx, ny=g.ny, method="rbgs",
                                 sweeps=2, omega=1.0)
        return got, ref, 1e-5

    def varcoef_strips():
        g, st, unknown, f, u = _problem2d(513, varcoef=True)
        ref = smooth_mod.smooth(st, u, f, unknown, method="rbgs", sweeps=2,
                                omega=1.0)
        got = psmooth.multisweep_strips(st, u, f, nx=g.nx, ny=g.ny,
                                        method="rbgs", sweeps=2, omega=1.0,
                                        strip=128)
        return got, ref, 1e-5

    # ---- 2D parity-plane layout (whole-grid + strips) ----
    def parity_whole():
        g, st, unknown, f, u = _problem2d(513)
        ref = smooth_mod.smooth(st, u, f, unknown, method="rbgs", sweeps=2,
                                omega=1.0)
        got = psmooth.multisweep(st, u, f, nx=g.nx, ny=g.ny, method="rbgs",
                                 sweeps=2, omega=1.0, layout="parity")
        return got, ref, 0.0  # bit-exact contract (_parity_sweeps)

    def parity_strips():
        g, st, unknown, f, u = _problem2d(1025)
        ref = smooth_mod.smooth(st, u, f, unknown, method="rbgs", sweeps=2,
                                omega=1.0)
        got = psmooth.multisweep_strips(st, u, f, nx=g.nx, ny=g.ny,
                                        method="rbgs", sweeps=2, omega=1.0,
                                        layout="parity")
        return got, ref, 0.0

    # ---- 2D var-coef fused residual+restrict ----
    def varcoef_rr():
        g, st, unknown, f, u = _problem2d(513, varcoef=True)
        gc = g.coarsen()
        r = st_mod.residual(st, u, f, unknown)
        ref = transfer_mod.restrict(r, gc.nx, gc.ny, gc.shape_padded,
                                    method="full_weighting",
                                    dtype=jnp.float32)
        got = ptransfer.residual_restrict(
            st, u, f, nxf=g.nx, nyf=g.ny, ncx=gc.nx, ncy=gc.ny,
            pshape_coarse=gc.shape_padded)
        return got, ref, 1e-5

    # ---- Neumann/Robin fused transfer pair (reflect folds) ----
    def neumann_rr_pc():
        spec = bc_mod.BoundarySpec(
            east=bc_mod.BCSide(kind=bc_mod.BCKind.NEUMANN),
            north=bc_mod.BCSide(kind=bc_mod.BCKind.ROBIN,
                                alpha=1.0, beta=1.0))
        n = 513
        g = Grid(n, n)
        gc = g.coarsen()
        st = st_mod.make_stencil(g, spec, dtype=jnp.float32)
        unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded, spec)
        unknown_c = bc_mod.unknown_mask(gc.nx, gc.ny, gc.shape_padded, spec)
        sides = tuple(spec.side(s).kind == bc_mod.BCKind.DIRICHLET
                      for s in bc_mod.SIDES)
        rng = np.random.default_rng(11)
        u = jnp.asarray(rng.standard_normal(g.shape_padded)
                        .astype(np.float32))
        f = jnp.asarray(rng.standard_normal(g.shape_padded)
                        .astype(np.float32))
        r = st_mod.residual(st, u, f, unknown)
        fc_ref = transfer_mod.restrict(
            r, gc.nx, gc.ny, gc.shape_padded, method="full_weighting",
            boundary="reflect", dtype=jnp.float32)
        fc_ref = jnp.where(unknown_c, fc_ref, jnp.zeros((), jnp.float32))
        fc = ptransfer.residual_restrict(
            st, u, f, nxf=g.nx, nyf=g.ny, ncx=gc.nx, ncy=gc.ny,
            pshape_coarse=gc.shape_padded, sides=sides)
        e = transfer_mod.prolong(fc_ref, gc.nx, gc.ny, g.nx, g.ny,
                                 g.shape_padded, dtype=jnp.float32)
        u_ref = jnp.where(unknown, u + e, u)
        u_got = ptransfer.prolong_correct(
            fc_ref, u, ncx=gc.nx, ncy=gc.ny, nxf=g.nx, nyf=g.ny,
            sides=sides)
        return (jnp.concatenate([fc.ravel(), u_got.ravel()]),
                jnp.concatenate([fc_ref.ravel(), u_ref.ravel()]), 1e-5)

    # ---- fused coarse-tail V-cycle ----
    def tail():
        n = 65
        cfg = mg_mod.MultigridConfig(smoother="rbgs", omega=1.0,
                                     backend="xla", coarse_sweeps=8)
        levels = mg_mod.build_hierarchy(Grid(n, n), cfg=cfg,
                                        dtype=jnp.float32)
        g = levels[0].grid
        rng = np.random.default_rng(9)
        f = np.zeros(g.shape_padded, np.float32)
        f[1:n - 1, 1:n - 1] = rng.standard_normal((n - 2, n - 2))
        f = jnp.asarray(f)
        u = jnp.zeros_like(f)
        ref = mg_mod.mg_cycle(levels, u, f, cfg)
        meta = tuple((lev.grid.nx, lev.grid.ny) + tuple(lev.grid.shape_padded)
                     for lev in levels)
        got = ptail.tail_vcycle(
            [lev.stencil for lev in levels], u, f, meta=meta,
            pre=cfg.pre_sweeps, post=cfg.post_sweeps, omega=cfg.omega,
            method="rbgs", coarse_sweeps=cfg.coarse_sweeps)
        return got, ref, 1e-4

    # ---- variable-coefficient fused coarse tail ----
    def tail_var():
        n = 65
        cfg = mg_mod.MultigridConfig(smoother="rbgs", omega=1.0,
                                     backend="xla", coarse_sweeps=8)
        g0 = Grid(n, n)
        X, Y = np.meshgrid(np.linspace(0, 1, g0.shape_padded[0]),
                           np.linspace(0, 1, g0.shape_padded[1]),
                           indexing="ij")
        a = (1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(np.pi * Y))
        a = np.where(X > 0.5, 10.0 * a, a).astype(np.float32)
        levels = mg_mod.build_hierarchy(g0, a=jnp.asarray(a), cfg=cfg,
                                        dtype=jnp.float32)
        rng = np.random.default_rng(13)
        f = np.zeros(g0.shape_padded, np.float32)
        f[1:n - 1, 1:n - 1] = rng.standard_normal((n - 2, n - 2))
        f = jnp.asarray(f)
        u = jnp.zeros_like(f)
        ref = mg_mod.mg_cycle(levels, u, f, cfg)
        meta = tuple((lev.grid.nx, lev.grid.ny) + tuple(lev.grid.shape_padded)
                     for lev in levels)
        got = ptail.tail_vcycle_var(
            [lev.stencil for lev in levels], u, f, meta=meta,
            pre=cfg.pre_sweeps, post=cfg.post_sweeps, omega=cfg.omega,
            method="rbgs", coarse_sweeps=cfg.coarse_sweeps)
        return got, ref, 1e-4

    # ---- 3D plane-pipeline smoother ----
    def planes3d_small():
        g, st, unknown, f, u = _problem3d((33, 33, 33))
        ref = smooth3d(st, u, f, unknown, method="rbgs", sweeps=2, omega=1.0)
        got = ps3.rbgs_planes(st, u, f, nx=g.nx, ny=g.ny, nz=g.nz, sweeps=2)
        return got, ref, 1e-6

    def planes3d_strips():
        g, st, unknown, f, u = _problem3d((65, 129, 65))
        ref = smooth3d(st, u, f, unknown, method="rbgs", sweeps=2, omega=1.0)
        got = ps3.rbgs_planes(st, u, f, nx=g.nx, ny=g.ny, nz=g.nz, sweeps=2,
                              ystrip=64)
        return got, ref, 1e-6

    # ---- 3D fused transfers ----
    def rr3d():
        g, st, unknown, f, u = _problem3d((65, 65, 65))
        gc = g.coarsen()
        r = st3.residual(st, u, f, unknown)
        ref = t3.restrict3d(r, gc.nx, gc.ny, gc.nz, gc.shape_padded,
                            method="full_weighting", dtype=jnp.float32)
        got = pt3.residual_restrict3d(
            st, u, f, nxf=g.nx, nyf=g.ny, nzf=g.nz,
            ncx=gc.nx, ncy=gc.ny, ncz=gc.nz,
            pshape_coarse=gc.shape_padded)
        return got, ref, 1e-5

    def pc3d():
        g, st, unknown, f, u = _problem3d((65, 65, 65))
        gc = g.coarsen()
        rng = np.random.default_rng(21)
        ec = np.zeros(gc.shape_padded, np.float32)
        ec[: gc.nx, : gc.ny, : gc.nz] = rng.standard_normal(
            (gc.nx, gc.ny, gc.nz)).astype(np.float32)
        ec = jnp.asarray(ec)
        e = t3.prolong3d(ec, gc.nx, gc.ny, gc.nz, g.nx, g.ny, g.nz,
                         g.shape_padded, dtype=jnp.float32)
        ref = jnp.where(unknown, u + e, u)
        got = pt3.prolong_correct3d(
            ec, u, ncx=gc.nx, ncy=gc.ny, ncz=gc.nz,
            nxf=g.nx, nyf=g.ny, nzf=g.nz)
        return got, ref, 1e-5

    return {
        "parity_smooth_whole": parity_whole,
        "parity_smooth_strips": parity_strips,
        "varcoef_smooth_whole": varcoef_whole,
        "varcoef_smooth_strips": varcoef_strips,
        "varcoef_residual_restrict": varcoef_rr,
        "neumann_fused_transfers": neumann_rr_pc,
        "tail_vcycle": tail,
        "tail_vcycle_var": tail_var,
        "smooth3d_planes_small": planes3d_small,
        "smooth3d_planes_strips": planes3d_strips,
        "residual_restrict3d": rr3d,
        "prolong_correct3d": pc3d,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]

    print(f"# backend: {jax.default_backend()} devices: {jax.devices()}",
          flush=True)
    summary = {}
    for name, fn in cases().items():
        if only and not any(s in name for s in only):
            continue
        try:
            got, ref, tol = fn()
            ok, err = _check(name, got, ref, tol)
            summary[name] = {"ok": ok, "rel_err": err}
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"FAIL  {name:42s} EXC: {msg}", flush=True)
            summary[name] = {"ok": False, "exc": msg,
                             "trace": traceback.format_exc()[-2000:]}
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "trace"}
                      for k, v in summary.items()}))
    return summary


if __name__ == "__main__":
    main()
