"""3D geometric multigrid (V/W cycles), jit-first.

3D sibling of solvers/multigrid.py — capability the reference stubbed out
(reference applications/poisson_solver.py:483-557). Shares MultigridConfig;
smoothers are inlined here (weighted Jacobi + red-black GS with 3D parity).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid3d import Grid3D
from ..core.precision import as_dtype
from ..ops import stencil3d as st3, transfer3d
from ..ops.stencil3d import Stencil3D
from .multigrid import MultigridConfig, convergence_factor


@dataclasses.dataclass(frozen=True)
class Level3D:
    stencil: Stencil3D
    grid: Grid3D
    dtype: Any

    @property
    def unknown(self):
        return st3.unknown_mask3d(self.grid)


jax.tree_util.register_dataclass(
    Level3D, data_fields=("stencil",), meta_fields=("grid", "dtype")
)


def _sample_coarse3(field, fine: Grid3D, coarse: Grid3D):
    if field is None or jnp.ndim(field) == 0:
        return field
    c = field[0 : fine.nx : 2, 0 : fine.ny : 2, 0 : fine.nz : 2]
    out = jnp.zeros(coarse.shape_padded, field.dtype)
    return out.at[: coarse.nx, : coarse.ny, : coarse.nz].set(
        c[: coarse.nx, : coarse.ny, : coarse.nz]
    )


def build_hierarchy3d(
    grid: Grid3D,
    *,
    a=None,
    lam=0.0,
    dtype=None,
    cfg: MultigridConfig = MultigridConfig(),
) -> Tuple[Level3D, ...]:
    grids = [grid]
    while grids[-1].can_coarsen() and len(grids) < cfg.max_levels:
        grids.append(grids[-1].coarsen())
    dt = as_dtype(dtype if dtype is not None else jnp.float32)
    levels = []
    a_l, lam_l = a, lam
    for g in grids:
        st = st3.make_stencil3d(g, a=a_l, lam=lam_l, dtype=dt)
        levels.append(Level3D(stencil=st, grid=g, dtype=np.dtype(dt)))
        if g.can_coarsen():
            gc = g.coarsen()
            a_l = _sample_coarse3(a_l, g, gc)
            lam_l = _sample_coarse3(lam_l, g, gc)
    return tuple(levels)


# --------------------------------------------------------------------------
# smoothing
# --------------------------------------------------------------------------

def _parity3(pshape):
    i = jax.lax.broadcasted_iota(jnp.int32, pshape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, pshape, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, pshape, 2)
    return ((i + j + k) & 1) == 0


def smooth3d(st: Stencil3D, u, f, unknown, *, method: str = "rbgs",
             sweeps: int = 2, omega: float = 1.0):
    om = jnp.asarray(omega, u.dtype)
    if method == "jacobi":

        def body(_, u):
            r = f - st3.apply(st, u)
            return jnp.where(unknown, u + om * r / st.c, u)

    else:  # rbgs / sor
        red = _parity3(u.shape)

        def color(u, mask):
            u_gs = (f + st3.neighbor_sum(st, u)) / st.c
            return jnp.where(mask & unknown, u + om * (u_gs - u), u)

        def body(_, u):
            u = color(u, red)
            return color(u, ~red)

    if sweeps <= 2:
        for k in range(sweeps):
            u = body(k, u)
        return u
    return jax.lax.fori_loop(0, sweeps, body, u)


# --------------------------------------------------------------------------
# cycles + solve
# --------------------------------------------------------------------------

def _cycle3(levels, u, f, lvl: int, cfg: MultigridConfig, cycle_type: str):
    lev = levels[lvl]
    unknown = lev.unknown
    if lvl == len(levels) - 1:
        return smooth3d(lev.stencil, u, f, unknown, method="rbgs",
                        sweeps=cfg.coarse_sweeps, omega=1.0)

    u = smooth3d(lev.stencil, u, f, unknown, method=cfg.smoother,
                 sweeps=cfg.pre_sweeps, omega=cfg.omega)
    r = st3.residual(lev.stencil, u, f, unknown)
    nxt = levels[lvl + 1]
    fc = transfer3d.restrict3d(
        r, nxt.grid.nx, nxt.grid.ny, nxt.grid.nz, nxt.grid.shape_padded,
        method="full_weighting", dtype=nxt.dtype,
    )
    ec = jnp.zeros(nxt.grid.shape_padded, nxt.dtype)
    branch = cycle_type if lvl + 1 < cfg.w_depth else "V"
    ec = _cycle3(levels, ec, fc, lvl + 1, cfg, branch)
    if cycle_type == "W" and branch == "W":
        ec = _cycle3(levels, ec, fc, lvl + 1, cfg, "W")
    e = transfer3d.prolong3d(
        ec, nxt.grid.nx, nxt.grid.ny, nxt.grid.nz,
        lev.grid.nx, lev.grid.ny, lev.grid.nz, lev.grid.shape_padded,
        dtype=lev.dtype,
    )
    u = jnp.where(unknown, u + e, u)
    u = smooth3d(lev.stencil, u, f, unknown, method=cfg.smoother,
                 sweeps=cfg.post_sweeps, omega=cfg.omega)
    return u


def mg_cycle3d(levels, u, f, cfg: MultigridConfig = MultigridConfig()):
    return _cycle3(levels, u, f, 0, cfg, cfg.cycle)


def _norm3(r, g: Grid3D):
    r64 = r.astype(jnp.float64)
    return jnp.sqrt(g.hx * g.hy * g.hz * jnp.sum(r64 * r64))


@partial(jax.jit, static_argnames=("cfg",))
def _solve3_jit(levels, f, u0, cfg: MultigridConfig):
    lev0 = levels[0]
    unknown = lev0.unknown
    g = lev0.grid
    f = f.astype(lev0.dtype)
    u = u0.astype(lev0.dtype)
    fnorm = _norm3(jnp.where(unknown, f, jnp.zeros((), f.dtype)), g)
    tol_eff = jnp.where(jnp.asarray(cfg.rtol),
                        cfg.tol * jnp.maximum(fnorm, 1e-300), cfg.tol)
    r0 = st3.residual(lev0.stencil, u, f, unknown)
    rnorm0 = _norm3(r0, g)
    hist = jnp.full((cfg.max_iterations + 1,), jnp.nan, jnp.float64)
    hist = hist.at[0].set(rnorm0)

    def cond(c):
        _, k, rnorm, _ = c
        return (rnorm > tol_eff) & (k < cfg.max_iterations)

    def body(c):
        u, k, rnorm, hist = c
        u = mg_cycle3d(levels, u, f, cfg)
        r = st3.residual(lev0.stencil, u, f, unknown)
        rnorm = _norm3(r, g)
        hist = hist.at[k + 1].set(rnorm)
        return (u, k + 1, rnorm, hist)

    u, k, rnorm, hist = jax.lax.while_loop(
        cond, body, (u, jnp.asarray(0, jnp.int32), rnorm0, hist)
    )
    # single packed stats buffer -> single host readback (see multigrid.py)
    stats = jnp.stack([
        k.astype(jnp.float64), rnorm, rnorm0, fnorm,
        (rnorm <= tol_eff).astype(jnp.float64),
    ])
    return u, jnp.concatenate([stats, hist])


@partial(jax.jit, static_argnames=("cfg", "inner_cycles", "max_outer"))
def _ir3_jit(levels, st_hi, f, u0, cfg: MultigridConfig, inner_cycles: int,
             max_outer: int):
    lev0 = levels[0]
    unknown = lev0.unknown
    g = lev0.grid
    lo = lev0.dtype
    f = f.astype(jnp.float64)
    u = u0.astype(jnp.float64)
    fnorm = _norm3(jnp.where(unknown, f, jnp.zeros((), f.dtype)), g)
    tol_eff = jnp.where(jnp.asarray(cfg.rtol),
                        cfg.tol * jnp.maximum(fnorm, 1e-300), cfg.tol)
    rnorm0 = _norm3(st3.residual(st_hi, u, f, unknown), g)
    hist = jnp.full((max_outer + 1,), jnp.nan, jnp.float64)
    hist = hist.at[0].set(rnorm0)

    def cond(c):
        _, k, rnorm, _ = c
        return (rnorm > tol_eff) & (k < max_outer)

    def body(c):
        u, k, rnorm, hist = c
        r = st3.residual(st_hi, u, f, unknown)
        e = jnp.zeros(g.shape_padded, lo)
        r_lo = r.astype(lo)
        for _ in range(inner_cycles):
            e = mg_cycle3d(levels, e, r_lo, cfg)
        u = jnp.where(unknown, u + e.astype(jnp.float64), u)
        rnorm = _norm3(st3.residual(st_hi, u, f, unknown), g)
        hist = hist.at[k + 1].set(rnorm)
        return (u, k + 1, rnorm, hist)

    u, k, rnorm, hist = jax.lax.while_loop(
        cond, body, (u, jnp.asarray(0, jnp.int32), rnorm0, hist))
    stats = jnp.stack([
        k.astype(jnp.float64), rnorm, rnorm0, fnorm,
        (rnorm <= tol_eff).astype(jnp.float64),
    ])
    return u, jnp.concatenate([stats, hist])


def ir_solve3d(
    levels: Tuple[Level3D, ...],
    f,
    u0=None,
    cfg: MultigridConfig = MultigridConfig(),
    *,
    inner_cycles: int = 2,
    max_outer: int = 100,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """3D mixed-precision solve: fp64 outer residuals over low-precision
    cycles (3D sibling of solvers.refinement.ir_solve)."""
    lev0 = levels[0]
    if u0 is None:
        u0 = jnp.zeros(lev0.grid.shape_padded, jnp.float64)
    st_hi = lev0.stencil.astype(jnp.float64)
    u, packed = _ir3_jit(levels, st_hi, f, u0, cfg, inner_cycles, max_outer)
    from .multigrid import _unpack_info

    out = _unpack_info(np.asarray(packed))
    out["method"] = "iterative_refinement_3d"
    return u, out


def mg_solve3d(
    levels: Tuple[Level3D, ...],
    f,
    u0=None,
    cfg: MultigridConfig = MultigridConfig(),
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    if u0 is None:
        u0 = jnp.zeros(levels[0].grid.shape_padded, levels[0].dtype)
    from .multigrid import _unpack_info

    u, packed = _solve3_jit(levels, f, u0, cfg)
    return u, _unpack_info(np.asarray(packed))
